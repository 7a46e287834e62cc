package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField}
import graft.core.DbError
import graft.lang.Op._

/** Operator semantics of the language, as pure DataFrame transforms.
  *
  * Shared by the script interpreter ([[graft.core.Engine]]) and by the
  * library-level query entry points. Schemas:
  *  - base column: `(id: long, v: int)` — dense stable positions;
  *  - id set (select output): `(id)`, distinct, unordered
  *    (reference "bitmap", results.h:12-23);
  *  - id list (join output): `(pos, id)` — ordered, duplicates allowed
  *    (reference "array");
  *  - values: `(pos, id, v)` — `pos` is the output ordinal (the math/tuple
  *    alignment key), `id` the source position (null for math/agg results).
  *
  * Scale notes: ordinal assignment ([[withPos]]) is a range-partitioned
  * distributed sort + a two-pass zipWithIndex — no single-partition windows,
  * no driver collect. Selects are plain filters (predicate-pushdown eligible
  * all the way to parquet); fetch and join are equi-joins that AQE can
  * re-plan (broadcast when one side is small).
  */
object ColumnOps {

  /** 32-bit wrapping view of a long column — reproduces C int overflow
    * (reference sum/math, aggregate.c:64-72,148-170) without relying on
    * non-ANSI cast behavior (ANSI-safe: the final cast is always in range).
    */
  def wrapInt(c: Column): Column =
    (pmod(c + lit(2147483648L), lit(4294967296L)) - lit(2147483648L))
      .cast(IntegerType)

  /** Integer division with C truncation-toward-zero semantics on longs
    * (Spark SQL's `div` operator is exactly that), guarded so a zero
    * divisor yields null instead of an ANSI runtime error — callers turn
    * nulls into the language's DBEDIVZERO error.
    */
  def divTrunc(a: Column, b: Column): Column =
    when(b === 0, lit(null).cast(LongType))
      .otherwise(call_function("div", a.cast(LongType), b.cast(LongType)))

  /** Append a dense 0..n-1 `pos` ordinal in the order of `orderCols`.
    * Distributed: range-partitioned sort, then per-partition offsets
    * (RDD zipWithIndex — one extra pass to count partitions, no shuffle).
    */
  def withPos(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = if (orderCols.isEmpty) df else df.orderBy(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      StructField("pos", LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(i +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  // ---- selects (storage.c:1110-1153; bounds inclusive) ----

  def selectAll(base: DataFrame): DataFrame = base.select("id")

  def selectValue(base: DataFrame, x: Long): DataFrame =
    base.filter(col("v") === lit(x)).select("id")

  def selectRange(base: DataFrame, lo: Long, hi: Long): DataFrame =
    base.filter(col("v").between(lit(lo), lit(hi))).select("id")

  // ---- fetch (storage.c:1298-1387) ----

  /** Positional projection for a select-produced id set: values of `base`
    * at the given positions, ordinal = ascending id (the reference's bitmap
    * iteration order, storage.c:1324-1326).
    */
  def fetchSet(base: DataFrame, ids: DataFrame): DataFrame =
    withPos(ids.join(base, "id").select("id", "v"), Seq(col("id")))
      .select("pos", "id", "v")

  /** Positional projection for a join-produced (pos,id) list: input order
    * and duplicates preserved (storage.c:1354-1366).
    */
  def fetchList(base: DataFrame, posIds: DataFrame): DataFrame =
    posIds.join(base, "id").select("pos", "id", "v")

  // ---- joins (join.c:327-390) ----

  /** Value equi-join of two fetched intermediates -> aligned position
    * pairs `(pos, lid, rid)`, one row per matching value pair (M×N for
    * duplicate values), `pos` dense in (left-pos, right-pos) order.
    *
    * The four language keywords select the physical algorithm; here they
    * map to Catalyst join hints (the reference's manual algorithm choice is
    * the closest it has to an optimizer, join.c:341-343 — Spark/AQE may
    * still override, which only changes the plan, never the result):
    * loopjoin -> unhinted (AQE picks), sortjoin -> MERGE,
    * hashjoin -> SHUFFLE_HASH, treejoin -> BROADCAST of the indexed side
    * (an index probe ≈ a broadcast hash probe).
    */
  def join(jtype: JoinType, l: DataFrame, r: DataFrame): DataFrame = {
    val lf = l.select(col("pos").as("lpos"), col("id").as("lid"), col("v"))
    val rf0 = r.select(col("pos").as("rpos"), col("id").as("rid"), col("v"))
    val rf = jtype match {
      case SortJoin => rf0.hint("MERGE")
      case HashJoin => rf0.hint("SHUFFLE_HASH")
      case TreeJoin => rf0.hint("BROADCAST")
      case LoopJoin => rf0
    }
    val pairs = lf.join(rf, "v").select(col("lpos"), col("lid"), col("rid"))
    withPos(pairs, Seq(col("lpos"), col("rid")))
      .select(col("pos"), col("lid"), col("rid"))
  }

  // ---- aggregates (aggregate.c:9-98) ----

  /** Singleton aggregate of a values intermediate, with the reference's
    * empty-input identities: min->INT_MAX, max->INT_MIN, sum->0,
    * count->0; avg on empty errors (DBEDIVZERO, aggregate.c:18-21).
    * sum wraps at 32 bits; avg is truncating integer division.
    */
  def aggregate(atype: AggType, vals: DataFrame): DataFrame = {
    val agg = atype match {
      case AggMin   => coalesce(min(col("v")), lit(Int.MaxValue))
      case AggMax   => coalesce(max(col("v")), lit(Int.MinValue))
      case AggSum   => wrapInt(coalesce(sum(col("v")), lit(0L)))
      case AggCount => count(lit(1)).cast(IntegerType)
      case AggAvg   =>
        // sum and count as longs; integer division truncating toward zero;
        // empty input -> null here -> DBEDIVZERO at the engine layer
        divTrunc(sum(col("v").cast(LongType)), count(lit(1))).cast(IntegerType)
    }
    val out = vals.agg(agg.as("v"))
      .select(lit(0L).as("pos"), lit(null).cast(LongType).as("id"), col("v"))
    if (atype == AggAvg) out.na.drop(Seq("v")) // empty input -> caller errors
    else out
  }

  // ---- elementwise math (aggregate.c:100-182) ----

  /** Elementwise `add/sub/mul/div` of two equal-length values
    * intermediates, aligned by ordinal `pos` (NOT by id). Results carry no
    * ids (aggregate.c:119-134). 32-bit wrapping; div truncates toward zero.
    * Caller enforces the equal-length (DBEINTERMDIFFLEN) and div-by-zero
    * (DBEDIVZERO) errors.
    */
  def math(mtype: MathType, l: DataFrame, r: DataFrame): DataFrame = {
    val lf = l.select(col("pos"), col("v").cast(LongType).as("v1"))
    val rf = r.select(col("pos"), col("v").cast(LongType).as("v2"))
    val joined = lf.join(rf, "pos")
    val vOut = mtype match {
      case MathAdd => wrapInt(col("v1") + col("v2"))
      case MathSub => wrapInt(col("v1") - col("v2"))
      case MathMul => wrapInt(col("v1") * col("v2"))
      case MathDiv => wrapInt(divTrunc(col("v1"), col("v2")))
    }
    joined.select(col("pos"), lit(null).cast(LongType).as("id"), vOut.as("v"))
  }

  // ---- tuple (server.c:656-701, rpc.c:209-235) ----

  /** Zip k values intermediates by ordinal into k-column rows, in `pos`
    * order. Columns named v1..vk. Equal lengths enforced by the caller.
    */
  def tupleZip(vals: Seq[DataFrame]): DataFrame = {
    require(vals.nonEmpty)
    val renamed = vals.zipWithIndex.map { case (df, i) =>
      df.select(col("pos"), col("v").as(s"v${i + 1}"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, "pos"))
    joined.orderBy("pos")
  }
}
