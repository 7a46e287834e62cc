package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark's built-in operators don't provide directly —
  * as-of (most recent match) and range (point-in-interval) — each shaped
  * so the plan is a single hash shuffle + linear pass, never an
  * inequality nested-loop. Both are declarative compositions (union +
  * running window; explode + equi-join), so Catalyst still prunes,
  * pushes filters, and runs whole-stage codegen around them.
  */
object TemporalJoin {

  /** A time column as an exact integral epoch: `TimestampType` converts
    * to epoch-MILLIS explicitly (a plain `cast("long")` would truncate
    * to whole seconds — a right row up to 0.999s in the future would tie
    * with, and be attached to, an earlier left row); integral columns
    * pass through unchanged (callers' units are preserved — this repo's
    * events surface as epoch-ms longs).
    */
  private def epochLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
      case _ => col(c).cast("long")
    }

  /** As-of join: for every left row, attach the single most recent right
    * row with `right.ts <= left.ts` in the same `key` group (inclusive —
    * a right row at exactly `left.ts` matches).
    *
    * Implementation: tag both sides, union them, and carry the latest
    * right payload forward with `last(_, ignoreNulls)` over ONE running
    * window per key ordered by `(ts, side)` (right sorts before left at
    * equal ts, which is what makes the bound inclusive). That is a
    * single shuffle on `key` and a linear per-partition pass — the
    * inequality-join formulation Spark would otherwise plan as a
    * broadcast-nested-loop never appears, so the operator scales to
    * arbitrarily many rows per side. At 100 TB the only skew risk is a
    * hot key, which salting can't help here (the window needs the whole
    * key group ordered); shard hot keys by coarse time range upstream
    * instead.
    *
    * `left` keeps all its columns; the matched right payload arrives as
    * one struct column `asof` (null when nothing precedes). The right
    * side must be unique per `(key, ts)` — pre-aggregate it if not, or
    * which of the tied rows wins is undefined.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String]): DataFrame = {
    val payCols = payload.map(col)
    val payType = right.select(payCols: _*).schema
    val rowType = left.schema
    val r = right.select(col(key).as("__k"), epochLong(right, ts).as("__t"),
      lit(0).as("__side"), struct(payCols: _*).as("__pay"),
      lit(null).cast(rowType).as("__row"))
    val l = left.select(col(key).as("__k"), epochLong(left, ts).as("__t"),
      lit(1).as("__side"), lit(null).cast(payType).as("__pay"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col("__asof").as("asof"))
  }

  /** Exact floor-division bucket id in pure long arithmetic:
    * `x - pmod(x, m)` is an exact multiple of `m`, so the integral `div`
    * is exact floor-division for any sign. The naive double
    * `floor(x / m)` loses bits above 2^53 (e.g. nanosecond epochs) near
    * bucket boundaries.
    */
  private def bucketOf(x: Column, width: Long): Column =
    call_function("div", x - pmod(x, lit(width)), lit(width))

  /** Range (point-in-interval) join: `intervals(key, lo, hi)` ×
    * `points(key, t)`, emitting every pair with `lo <= t <= hi` in the
    * same key group.
    *
    * Implementation: each interval explodes into the `bucketMs`-wide
    * time buckets it overlaps, each point lands in exactly one bucket,
    * and the pair production is a plain equi-join on `(key, bucket)`
    * with the exact range predicate as a residual filter. Cost is
    * `|intervals| × (span/bucketMs + 1) + |points|` shuffled rows — pick
    * `bucketMs` on the order of the typical interval span so intervals
    * explode into O(1) buckets. Spark's own plan for the inequality
    * predicate would be a broadcast-nested-loop (all pairs per key);
    * this shape keeps it a hash join at any scale.
    *
    * Bucket ids AND the residual filter both run on [[epochLong]]-
    * normalized values, so a TimestampType side and an epoch-ms long
    * side pair correctly — the residual never compares a raw long to a
    * raw timestamp (which Spark would implicitly cast as SECONDS,
    * silently dropping every true pair). Integral inputs keep the
    * caller's units, which must agree across both inputs.
    */
  def range(intervals: DataFrame, points: DataFrame, key: String,
            lo: String, hi: String, t: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val iv = intervals
      .withColumn("__lo", epochLong(intervals, lo))
      .withColumn("__hi", epochLong(intervals, hi))
      .withColumn("__b", explode(sequence(bucketOf(col("__lo"), bucketMs),
        bucketOf(col("__hi"), bucketMs))))
    val pt = points
      .withColumnsRenamed(Map(key -> "__pk", t -> "__pt"))
    val ptb = pt
      .withColumn("__bt", epochLong(pt, "__pt"))
      .withColumn("__b", bucketOf(col("__bt"), bucketMs))
    iv.join(ptb, iv(key) === ptb("__pk") && iv("__b") === ptb("__b") &&
        col("__bt") >= col("__lo") && col("__bt") <= col("__hi"))
      .drop("__b", "__pk", "__bt", "__lo", "__hi")
      .withColumnRenamed("__pt", t)
  }

  /** [[asOf]] for hot-key distributions: identical semantics, but the
    * running window partitions by `(key, shard)` where
    * `shard = floorDiv(ts, shardWidth)`, so one dominant key no longer
    * funnels its entire history through a single window partition — the
    * documented skew limit of [[asOf]] (salting can't help a window that
    * needs the whole key group ordered, but coarse TIME ranges can,
    * because as-of state is summarizable at a boundary).
    *
    * Boundary carry: a left row early in its shard must still see the
    * latest right row from EARLIER shards. Per `(key, shard)` the right
    * side reduces to its latest payload (one `max_by` aggregate), a
    * tiny per-key window (O(shards-per-key) rows, not O(rows)) runs the
    * carry forward, and each left shard receives one synthetic carry row
    * that sorts before everything in the shard (`__side = -1` at the
    * shard's own first position). A real right row at the same instant
    * still wins (side 0 sorts after -1), preserving [[asOf]]'s
    * inclusive-bound tie rule. No join appears anywhere — the plan is
    * two aggregates, two windows, and a union, all hash-partitioned.
    *
    * `shardWidth` is in the caller's [[epochLong]] units (ms for
    * TimestampType inputs); pick it so a hot key's rows spread across
    * many shards while normal keys stay in O(1) shards.
    */
  def asOfSharded(left: DataFrame, right: DataFrame, key: String,
                  ts: String, payload: Seq[String],
                  shardWidth: Long): DataFrame = {
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val payCols = payload.map(col)
    val payType = right.select(payCols: _*).schema
    val rowType = left.schema
    val r = right.select(col(key).as("__k"), epochLong(right, ts).as("__t"),
      lit(0).as("__side"), struct(payCols: _*).as("__pay"),
      lit(null).cast(rowType).as("__row"))
      .withColumn("__shard", bucketOf(col("__t"), shardWidth))
    val l = left.select(col(key).as("__k"), epochLong(left, ts).as("__t"),
      lit(1).as("__side"), lit(null).cast(payType).as("__pay"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))
      .withColumn("__shard", bucketOf(col("__t"), shardWidth))

    // Latest right payload per (key, shard): one partial-then-final
    // aggregate, the only full pass over the right side outside the
    // sharded window itself.
    val rLatest = r.groupBy("__k", "__shard")
      .agg(max_by(col("__pay"), col("__t")).as("__pay"))
      .withColumn("__tag", lit(1))
    // Shards that need a carry row = shards with at least one left row.
    val lShards = l.select("__k", "__shard").distinct()
      .withColumn("__pay", lit(null).cast(payType))
      .withColumn("__tag", lit(0))
    // Running carry over the per-key shard timeline. Ordering (__shard,
    // __tag) puts a left shard's marker BEFORE the same shard's right
    // summary, so the carry a shard receives covers strictly-earlier
    // shards only — in-shard rights are already inside the window below.
    val wCarry = Window.partitionBy("__k").orderBy("__shard", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = rLatest.unionByName(lShards)
      .withColumn("__carry", last(
        when(col("__tag") === 1, col("__pay")), ignoreNulls = true).over(wCarry))
      .filter(col("__tag") === 0)
      .select(col("__k"), (col("__shard") * shardWidth).as("__t"),
        lit(-1).as("__side"), col("__carry").as("__pay"),
        lit(null).cast(rowType).as("__row"), col("__shard"))

    val w = Window.partitionBy("__k", "__shard").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r).unionByName(carries)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col("__asof").as("asof"))
  }
}
