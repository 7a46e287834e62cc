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
    val r = right.select(col(key).as("__k"), col(ts).cast("long").as("__t"),
      lit(0).as("__side"), struct(payCols: _*).as("__pay"),
      lit(null).cast(rowType).as("__row"))
    val l = left.select(col(key).as("__k"), col(ts).cast("long").as("__t"),
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
    def bucketOf(c: Column): Column = floor(c / bucketMs).cast("long")
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    val pt = points
      .withColumnsRenamed(Map(key -> "__pk", t -> "__pt"))
      .withColumn("__b", bucketOf(col("__pt")))
    iv.join(pt, iv(key) === pt("__pk") && iv("__b") === pt("__b") &&
        col("__pt") >= iv(lo) && col("__pt") <= iv(hi))
      .drop("__b", "__pk")
      .withColumnRenamed("__pt", t)
  }
}
