package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join hashes rows to partitions by key; one hot key (a viral
  * document id, a null-ish default, a stop-phrase shingle) lands its
  * entire M x N blowup on one task. AQE's skew-join split handles
  * moderate skew at runtime; this utility is the explicit salting form
  * for pipelines that KNOW their hot keys — deterministic, planner-
  * independent, and usable under any join type:
  *
  *  - the large (skewed) side gets a salt in [0, buckets) derived from a
  *    deterministic hash of its other columns;
  *  - the small side is replicated `buckets` times (explode over the salt
  *    range);
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `buckets` tasks. Result multiset is identical to the unsalted join.
  *
  * Cost model: small side inflates by `buckets`; use for joins where the
  * small side is modest but too big (or too skew-correlated) to
  * broadcast outright.
  */
object SkewJoin {

  /** Session knob (Spark SQL conf): when set to an int > 1, the engine's
    * join keywords route through [[saltedInnerJoin]] with that many salt
    * buckets (treejoin excepted — a broadcast probe has no shuffle to
    * skew). Read at plan-build time; same result multiset either way.
    */
  val BucketsKey = "graft.join.saltBuckets"

  def bucketsOf(df: DataFrame): Int = {
    val raw = df.sparkSession.conf.get(BucketsKey, "0")
    raw.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"$BucketsKey must be an integer, got '$raw'"))
  }

  /** Inner equi-join of `large` and `small` on `key`, salted into
    * `buckets` sub-keys. Column sets must be disjoint apart from `key`.
    *
    * Salt choice: `rand(seed)` rather than a content hash — hot keys in
    * the wild are usually hot with IDENTICAL rows (a default value, a
    * crawl dup), which any deterministic row function would send to one
    * bucket, silently restoring the skew. rand(seed) is seeded per
    * partition, so it is reproducible for a fixed partitioning and
    * always spreads; for an inner join every salt assignment yields the
    * same result multiset, so task retries stay correct.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      buckets: Int, seed: Long = 42L): DataFrame = {
    require(buckets > 0)
    val salted = large.withColumn("_salt",
      floor(rand(seed) * buckets).cast("long"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
