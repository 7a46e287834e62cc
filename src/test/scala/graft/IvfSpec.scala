package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{AnnIndex, Ivf, Similarity}

/** IVF ANN vs exact brute force on synthetic clustered vectors: recall@k
  * must be high when the data actually clusters (the IVF assumption).
  */
class IvfSpec extends SparkSpec {

  /** 400 vectors in 8 well-separated clusters (dim 16), deterministic. */
  private def clustered() = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new java.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 10f)
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF top-k recall vs brute force on clustered data") {
    val emb = clustered().cache()
    val pred = col("vec_id") < 40
    val exact = Similarity.bruteForceTopK(emb, k = 5, queryPred = pred)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(emb, k = 5, nCells = 8, iters = 2, nprobe = 2,
        queryPred = pred)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall (${ivf.size} vs ${exact.size})")
  }

  test("persisted index probe equals inline topK; freshness check catches drift") {
    val emb = clustered().cache()
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val pred = col("vec_id") < 40
    Ivf.buildIndex(emb, dir, nCells = 8, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "nid").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    // training is deterministic -> build-then-probe replays inline exactly
    assert(rows(Ivf.probeIndex(dir, Similarity.prepared(emb).filter(pred),
        k = 5, nprobe = 2)) ==
      rows(Ivf.topK(emb, k = 5, nCells = 8, iters = 2, nprobe = 2,
        queryPred = pred)))
    // current corpus + params -> current; changed params or corpus -> stale
    assert(graft.pipeline.AnnIndex.isCurrent(emb, dir, Seq(8L, 2L)))
    assert(!graft.pipeline.AnnIndex.isCurrent(emb, dir, Seq(8L, 3L)))
    assert(!graft.pipeline.AnnIndex.isCurrent(
      emb.filter(col("vec_id") < 100), dir, Seq(8L, 2L)))
    // ensure on a current index must NOT rebuild (meta untouched — a
    // single freshness file since the plain-file meta format)
    val metaFile = new java.io.File(s"$dir/meta")
    def metaStamp() = (metaFile.lastModified,
      new String(java.nio.file.Files.readAllBytes(metaFile.toPath)))
    val before = metaStamp()
    Ivf.ensureIndex(emb, dir, nCells = 8, iters = 2)
    assert(metaStamp() == before, "ensure rebuilt a current index")
  }

  test("IVF ranking within probed cells matches exact dot order") {
    val emb = clustered()
    val res = Ivf.topK(emb, k = 3, nCells = 8, iters = 1, nprobe = 8,
      queryPred = col("vec_id") === 0)
    // nprobe = nCells -> probes everything -> must equal brute force
    val exact = Similarity.bruteForceTopK(emb, k = 3,
      queryPred = col("vec_id") === 0)
    assert(res.select("qid", "rank", "nid").orderBy("qid", "rank")
      .collect().toSeq ==
      exact.select("qid", "rank", "nid").orderBy("qid", "rank")
        .collect().toSeq)
  }

  test("appendIndex equals build-time assignment and advances the meta") {
    val emb = clustered().cache()
    val base = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-app").toString
    Ivf.buildIndex(base, dir, nCells = 8, iters = 2)
    assert(Ivf.appendIndex(batch, dir, nCells = 8, iters = 2,
      maxGrowth = 3.0))
    // probe over the appended index == probing an index whose batch
    // rows were assigned at build time under the SAME centroids: the
    // whole-corpus probe with nprobe = nCells must equal brute force,
    // which can only hold if every appended vector landed findable in
    // its argmin cell
    val pred = col("vec_id") < 20
    val probed = Ivf.probeIndex(dir, Similarity.prepared(emb).filter(pred),
        k = 3, nprobe = 8)
      .select("qid", "rank", "nid").orderBy("qid", "rank").collect().toSeq
    val exact = Similarity.bruteForceTopK(emb, k = 3, queryPred = pred)
      .select("qid", "rank", "nid").orderBy("qid", "rank").collect().toSeq
    assert(probed == exact)
    // meta fingerprint advanced to the FULL corpus (ensure won't
    // rebuild) while nTrained still records the build-time corpus
    assert(AnnIndex.isCurrent(emb, dir, Seq(8, 2)))
    val meta = AnnIndex.readMeta(spark, dir).get
    assert(meta.n == 400L && meta.nTrained == 200L, meta.toString)
  }

  test("appendIndex refuses growth past maxGrowth and leaves the index intact") {
    val emb = clustered().cache()
    val base = emb.filter(col("vec_id") < 100)
    val batch = emb.filter(col("vec_id") >= 100) // 3x the trained size
    val dir = java.nio.file.Files.createTempDirectory("ivf-stale").toString
    Ivf.buildIndex(base, dir, nCells = 8, iters = 2)
    assert(!Ivf.appendIndex(batch, dir, nCells = 8, iters = 2,
      maxGrowth = 2.0))
    // untouched: still current for the BASE corpus, counts unchanged
    assert(AnnIndex.isCurrent(base, dir, Seq(8, 2)))
    assert(spark.read.parquet(s"$dir/lists").count() == 100L)
  }
}
