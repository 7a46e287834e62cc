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

  /** Scale path: random-hyperplane LSH. Deterministic pseudo-random
    * hyperplanes: plane p's weight for dimension j is +1/-1 by parity of
    * xxhash64(p, j). Signature = `planes` sign bits; candidates share a
    * signature bucket. Approximate (bucket boundaries lose some
    * neighbors) — by design; no SQL oracle.
    */
  def lshTopK(emb: DataFrame, k: Int, planes: Int, queryPred: Column): DataFrame = {
    val p = prepared(emb)
    val sigBits = (0 until planes).map { pl =>
      val proj = aggregate(
        zip_with(col("q"),
          transform(sequence(lit(0), size(col("q")) - 1),
            j => when(pmod(xxhash64(lit(pl), j), lit(2)) === 0, lit(1L)).otherwise(lit(-1L))),
          (x, s) => x * s),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << pl)
    }
    val sig = p.withColumn("sig", sigBits.reduce(_ + _))
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
}
