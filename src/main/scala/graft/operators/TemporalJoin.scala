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
    */
  def range(intervals: DataFrame, points: DataFrame, key: String,
            lo: String, hi: String, t: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    // Bucket ids in pure long arithmetic: x - pmod(x, m) is an exact
    // multiple of m, so the integral `div` is exact floor-division for
    // any sign. The naive double `floor(x / m)` loses bits above 2^53
    // (e.g. nanosecond epochs) and can round interval and point buckets
    // to DIFFERENT ids near a boundary — silently dropping true pairs,
    // which the residual filter cannot restore. TimestampType bounds
    // convert to epoch-ms (see [[epochLong]]); integral bounds keep the
    // caller's units, which must agree across both inputs.
    def bucketOf(x: Column): Column =
      call_function("div", x - pmod(x, lit(bucketMs)), lit(bucketMs))
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(epochLong(intervals, lo)),
        bucketOf(epochLong(intervals, hi)))))
    val pt = points
      .withColumn("__bt", epochLong(points, t))
      .withColumnsRenamed(Map(key -> "__pk", t -> "__pt"))
      .withColumn("__b", bucketOf(col("__bt"))).drop("__bt")
    iv.join(pt, iv(key) === pt("__pk") && iv("__b") === pt("__b") &&
        col("__pt") >= iv(lo) && col("__pt") <= iv(hi))
      .drop("__b", "__pk")
      .withColumnRenamed("__pt", t)
  }
}
