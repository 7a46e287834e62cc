package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.LongArrayDot

/** Similarity search over an embedding column (`array<float>`).
  *
  * All oracle-checked math is done on **integer-quantized** vectors
  * (`round(x*1000)` as long): integer dot products are exact in every
  * engine, so similarity thresholds and top-k ranking are fully
  * deterministic — no cross-engine float drift. Cosine thresholds become
  * integer cross-multiplications:
  *   cos(a,b) >= t  (dot>0)  <=>  dot^2 * tden^2 >= tnum^2 * na * nb
  * with all terms < 2^63 for dim<=64, |x|<=~30 after quantization.
  *
  * Scale notes: the brute-force path is a broadcast-style self-join
  * (query side small) — fine to a few 10k vectors; the LSH path buckets
  * by random-hyperplane signature first, so candidate generation is a
  * bucket-equi-join (shuffle on signature), never an all-pairs cross join.
  */
object Similarity {

  /** Quantize an `array<float>` column to exact integers. */
  def quantize(e: Column): Column =
    transform(e, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[LongArrayDot]] expression (a tight primitive loop inside
    * whole-stage codegen; the higher-order `aggregate(zip_with(...))`
    * formulation is interpreted per element and dominates pair-scoring).
    * Callers must [[LongArrayDot.register]] on the session first; every
    * DataFrame entry point below does.
    */
  def intDot(a: Column, b: Column): Column =
    call_function(LongArrayDot.name, a, b)

  /** `(vec_id, q, n2)`: quantized vector + its squared norm. */
  def prepared(emb: DataFrame, idCol: String = "vec_id",
               embCol: String = "embedding"): DataFrame = {
    LongArrayDot.register(emb.sparkSession)
    emb.select(col(idCol), quantize(col(embCol)).as("q"))
      .withColumn("n2", intDot(col("q"), col("q")))
  }

  /** Exact top-k by integer dot product, brute force: each query joined
    * against all candidates, ranked (dot desc, id asc — deterministic
    * tie-break). `queryPred` restricts the query side (keep it small; the
    * candidate side streams).
    */
  def bruteForceTopK(emb: DataFrame, k: Int, queryPred: Column): DataFrame = {
    val p = prepared(emb)
    val qs = p.filter(queryPred).select(col("vec_id").as("qid"), col("q").as("qq"))
    val cands = p.select(col("vec_id").as("nid"), col("q").as("nq"))
    val scored = qs.join(cands, col("qid") =!= col("nid"))
      .withColumn("dot", intDot(col("qq"), col("nq")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("nid"), col("dot"))
  }

  /** Near-duplicate pairs by quantized cosine >= tnum/tden (exact integer
    * comparison; requires dot > 0). Brute-force variant (oracle-matched).
    */
  def cosinePairs(emb: DataFrame, tnum: Long, tden: Long): DataFrame = {
    val p = prepared(emb)
    val a = p.select(col("vec_id").as("da"), col("q").as("qa"), col("n2").as("na"))
    val b = p.select(col("vec_id").as("db"), col("q").as("qb"), col("n2").as("nb"))
    a.join(b, col("da") < col("db"))
      .withColumn("dot", intDot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * (tden * tden) >= lit(tnum * tnum) * col("na") * col("nb"))
      .select("da", "db")
  }

  /** Deterministic +-1 hyperplane weight table `(pl, w)` for `planes`
    * planes of `dim` dimensions, broadcast-sized at any corpus scale.
    */
  private[pipeline] def planeWeights(emb: DataFrame, planes: Int,
                                     seedBase: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // empty table -> dim 0 -> empty weight vectors (results are empty
    // anyway); never .first() on a possibly-empty scan
    val dim = emb.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    (0 until planes).map { pl =>
      val rnd = new java.util.Random(seedBase + pl)
      (pl, Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
    }.toDF("pl", "w")
  }

  /** `(vec_id, q, n2, sig)`: prepared vectors + a `planes`-bit
    * random-hyperplane signature. For a handful of planes the weights are
    * inlined as literal arrays — `planes` codegen'd dot products per row,
    * zero extra joins or jobs (the broadcast weight-table shape in
    * [[lshCosinePairs]] is for hundreds of planes). P(two vectors share a
    * bit) = 1 - angle/pi, so near-identical vectors land in the same
    * bucket w.h.p. while the expected bucket size for unrelated vectors
    * is n / 2^planes.
    */
  def signed(emb: DataFrame, planes: Int): DataFrame = {
    val dim = emb.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    val p = prepared(emb)
    val sigBits = (0 until planes).map { pl =>
      val rnd = new java.util.Random(7001L + pl)
      val w = Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L)
      when(intDot(col("q"), typedlit(w)) >= 0, lit(1L << pl)).otherwise(lit(0L))
    }
    p.withColumn("sig", sigBits.reduce(_ + _))
  }

  /** Scale path for top-k: random-hyperplane LSH — candidates share a
    * signature bucket (bucket equi-join, never all-pairs). Approximate
    * (bucket boundaries lose some neighbors) — by design; no SQL oracle.
    */
  def lshTopK(emb: DataFrame, k: Int, planes: Int, queryPred: Column): DataFrame = {
    val sig = signed(emb, planes)
    val qs = sig.filter(queryPred)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("sig"))
    val cands = sig.select(col("vec_id").as("nid"), col("q").as("nq"), col("sig"))
    val scored = qs.join(cands, Seq("sig")).filter(col("qid") =!= col("nid"))
      .withColumn("dot", intDot(col("qq"), col("nq")))
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("nid"), col("dot"))
  }

  /** Scale path for embedding near-dup: **banded** random-hyperplane LSH
    * (OR of `bands` AND-constructions of `r` sign bits each) + exact
    * quantized-cosine verification of candidates only. The all-pairs
    * [[cosinePairs]] is the exact oracle-checked baseline; this is the
    * shape that survives 100 TB — candidates come from bucket equi-joins
    * on (band, band-signature), verification touches candidates only, so
    * false positives are impossible and cost is governed by bucket sizes.
    *
    * Math (P(bit agrees) = p = 1 - angle/pi): recall = 1-(1-p^r)^b;
    * background pair collision ~ b/2^r of the n^2 pairs. At production
    * near-dup thresholds (cos >= 0.85, p >= 0.82) the defaults b=64,r=8
    * give recall ~0.99+ at ~25% of the all-pairs verification cost; at
    * the synthetic tables' unusually low planted similarity (cos ~ 0.46,
    * p ~ 0.65) the same setting still finds ~88% of true pairs — the
    * regime analysis is the point: band/width are the knobs a 100 TB run
    * tunes to its similarity threshold.
    *
    * Hyperplane signatures are computed with the codegen'd [[LongArrayDot]]
    * against a broadcast table of deterministic +-1 weight vectors — one
    * narrow broadcast join + a group-by, no interpreted per-element lambdas.
    */
  def lshCosinePairs(emb: DataFrame, bands: Int, r: Int,
                     tnum: Long, tden: Long): DataFrame = {
    val wdf = planeWeights(emb, bands * r, seedBase = 1000003L)
      .select((col("pl") / r).cast("int").as("band"),
        pmod(col("pl"), lit(r)).as("bit_ix"), col("w"))
    val p = prepared(emb).cache()
    // narrow signatures (vec_id, band, bh) — vectors re-attach only after
    // the candidate distinct, so no grouping/dedup ever hashes an array
    val banded = p.crossJoin(broadcast(wdf))
      .select(col("vec_id"), col("band"),
        (when(intDot(col("q"), col("w")) >= 0, lit(1L)).otherwise(lit(0L)) *
          call_function("shiftleft", lit(1L), col("bit_ix"))).as("bit"))
      .groupBy("vec_id", "band").agg(sum(col("bit")).as("bh"))
    val cands = banded.select(col("band"), col("bh"), col("vec_id").as("da"))
      .join(banded.select(col("band"), col("bh"), col("vec_id").as("db")),
        Seq("band", "bh"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    cands
      .join(p.select(col("vec_id").as("da"), col("q").as("qa"),
        col("n2").as("na")), "da")
      .join(p.select(col("vec_id").as("db"), col("q").as("qb"),
        col("n2").as("nb")), "db")
      .withColumn("dot", intDot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * (tden * tden) >= lit(tnum * tnum) * col("na") * col("nb"))
      .select("da", "db")
  }
}
