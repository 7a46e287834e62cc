package graft

import graft.pipeline.Similarity

/** SemDeDup-style semantic dedup ([[Similarity.semanticPairs]]): k-means
  * cells bound the pairwise-cosine blocks. Pins the two contracts the
  * driver entry's invariant singleton stands on — nCells = 1 degenerates
  * to EXACTLY the brute-force [[Similarity.cosinePairs]] (the clustering
  * only ever partitions the pair space), and at any nCells the output is
  * a subset of the exact pairs (each emitted pair is exact-verified
  * within its cell) with near-identical vectors still co-clustering.
  */
class SemanticDedupSpec extends SparkSpec {

  /** 120 vectors in 6 well-separated clusters (dim 8), deterministic,
    * with planted near-duplicates: each cluster's vectors are tight
    * jitters of its center, so within-cluster cosines are high and
    * cross-cluster cosines low.
    */
  private def corpus() = {
    val spark0 = spark
    import spark0.implicits._
    // magnitudes match the quantization contract (Similarity scaladoc:
    // quantized |x| small enough that dot^2 * tden^2 stays inside long)
    val rnd = new java.util.Random(11)
    val centers = Array.fill(6, 8)(rnd.nextGaussian() * 0.02f)
    val rows = (0 until 120).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.002).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("nCells = 1 degenerates to exactly the brute-force cosine pairs") {
    val emb = corpus().cache()
    val exact = pairSet(Similarity.cosinePairs(emb, tnum = 9, tden = 10))
    val sem = pairSet(Similarity.semanticPairs(emb, nCells = 1, iters = 2,
      tnum = 9, tden = 10))
    assert(exact.nonEmpty, "test corpus must plant near-dup pairs")
    assert(sem == exact)
  }

  test("semantic pairs are a subset of exact pairs with co-clustered recall") {
    val emb = corpus().cache()
    val exact = pairSet(Similarity.cosinePairs(emb, tnum = 9, tden = 10))
    val sem = pairSet(Similarity.semanticPairs(emb, nCells = 6, iters = 4,
      tnum = 9, tden = 10))
    assert(sem.subsetOf(exact), s"${(sem -- exact).size} non-exact pairs")
    // tight planted clusters must co-cluster: the k-means premise
    val recall = (sem & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"semantic recall $recall over ${exact.size} pairs")
  }

  test("nAssign = 2 is monotone: superset of single-cell, still exact-verified") {
    val emb = corpus().cache()
    val exact = pairSet(Similarity.cosinePairs(emb, tnum = 9, tden = 10))
    val sem1 = pairSet(Similarity.semanticPairs(emb, nCells = 6, iters = 4,
      tnum = 9, tden = 10))
    val sem2 = pairSet(Similarity.semanticPairs(emb, nCells = 6, iters = 4,
      tnum = 9, tden = 10, nAssign = 2))
    // each vector's nearest cell is among its 2 nearest cells, so every
    // single-cell co-residence survives the overlap — recall can only rise
    assert(sem1.subsetOf(sem2), s"${(sem1 -- sem2).size} pairs lost by nAssign=2")
    assert(sem2.subsetOf(exact), s"${(sem2 -- exact).size} non-exact pairs")
  }

  test("a persisted IVF index's centroids reproduce the inline clustering") {
    val emb = corpus().cache()
    val dir = java.nio.file.Files.createTempDirectory("sem-idx").toString
    // index built on the same corpus with the same (nCells, iters):
    // deterministic training makes the stored centroids identical to an
    // inline run, so index-reuse dedup == inline dedup exactly
    graft.pipeline.Ivf.buildIndex(emb, dir, nCells = 6, iters = 4)
    val inline = pairSet(Similarity.semanticPairs(emb, nCells = 6, iters = 4,
      tnum = 9, tden = 10, nAssign = 2))
    val reused = pairSet(Similarity.semanticPairsWithIndex(emb, dir,
      tnum = 9, tden = 10, nAssign = 2))
    assert(reused == inline)
  }
}
