package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Ivf, Pq, Similarity}
import graft.queries.Tables

/** Measures the raw recall of every approximate path against its exact
  * twin, per SF dir — the numbers the driver-facing gates' floors
  * (`ann_recall`, `embedding_lsh_recall`) are calibrated from. Re-run
  * this whenever bands/r/nprobe or the seeds change, then keep each
  * floor ~5 points under the per-SF minimum so a genuine regression
  * trips the gate but deterministic-seed variance never does.
  *
  * Usage: runMain graft.tools.RecallProbe [sfDir ...]
  * (default: /root/testdata/sf0.001 sf0.01 sf0.1)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val exactTopk = Similarity.bruteForceTopK(emb, k = 3,
        queryPred = col("vec_id") < 100).select("qid", "nid").cache()
      val nExact = exactTopk.count()
      val lshHits = exactTopk.intersect(
        Similarity.lshTopK(emb, k = 3, bands = 16, r = 6,
          queryPred = col("vec_id") < 100).select("qid", "nid")).count()
      val ivfHits = exactTopk.intersect(
        Ivf.topK(emb, k = 3, nCells = 16, iters = 2, nprobe = 4,
          queryPred = col("vec_id") < 100).select("qid", "nid")).count()
      // int8 ranking fidelity (ann_quantized_recall floor): deterministic,
      // but still per-SF data-dependent — calibrate like the others
      val q8Hits = exactTopk.intersect(
        Similarity.quantizedTopK(emb, k = 3,
          queryPred = col("vec_id") < 100).select("qid", "nid")).count()
      // PQ config sweep history (sf0.01): m=8/ks=16 15.7%, m=16/ks=32
      // 40.3%, m=32/ks=32 66.7% — thin-margin synthetic embeddings need
      // fine subspaces; the driver runs the chosen m=32/ks=32
      val pqHits = exactTopk.intersect(
        Pq.topK(emb, k = 3, m = 32, ks = 32, iters = 2,
          queryPred = col("vec_id") < 100).select("qid", "nid")).count()
      // nprobe=8 matches the driver's IVFADC composition (residual
      // codes probe wider than exact-ranking IVF — see IvfPqSweep)
      val ivfpqHits = exactTopk.intersect(
        Pq.topKIvf(emb, k = 3, m = 32, ks = 32, iters = 2,
          nCells = 16, nprobe = 8,
          queryPred = col("vec_id") < 100).select("qid", "nid")).count()
      // IVFADC+R (ann_ivfpq_refine floor): the same probe's top-12 pool
      // exactly re-ranked to top-3 via the SHIPPED refine stage
      // (Pq.refineExact — a tie-break/scoring change there moves this
      // calibration too); refined recall >= the same-pool ADC ranking's
      // by construction
      val pool = Pq.topKIvf(emb, k = 12, m = 32, ks = 32, iters = 2,
        nCells = 16, nprobe = 8,
        queryPred = col("vec_id") < 100).select("qid", "nid")
      val refineHits = exactTopk.intersect(
        Pq.refineExact(pool, Similarity.prepared(emb).filter(col("vec_id") < 100),
          emb, k = 3).select("qid", "nid")).count()
      exactTopk.unpersist()
      val exactPairs = Similarity.cosinePairs(emb, tnum = 9, tden = 20).cache()
      val nPairs = exactPairs.count()
      val pairHits = exactPairs.intersect(
        Similarity.lshCosinePairs(emb, bands = 64, r = 8,
          tnum = 9, tden = 20)).count()
      // SemDeDup cells (dedup_semantic floor): nAssign=1 is the paper's
      // single-cell form; nAssign=2 (the driver entry's config) recovers
      // pairs straddling one Voronoi boundary
      val semHits = exactPairs.intersect(
        Similarity.semanticPairs(emb, nCells = 8, iters = 4,
          tnum = 9, tden = 20)).count()
      val sem2Hits = exactPairs.intersect(
        Similarity.semanticPairs(emb, nCells = 8, iters = 4,
          tnum = 9, tden = 20, nAssign = 2)).count()
      exactPairs.unpersist()
      // the SAMPLED gate populations (the driver entries run num/den =
      // 1/2): raw hit counts so floors can be chosen against the actual
      // small-population arithmetic, not a projected percentage
      val sampPred = graft.queries.PipelineQueries.mdSamplePred(
        col("vec_id"), 1L, 2L)
      val sExact = Similarity.bruteForceTopK(emb, k = 3,
        queryPred = col("vec_id") < 100 && sampPred)
        .select("qid", "nid").cache()
      val sN = sExact.count()
      val sLsh = sExact.intersect(Similarity.lshTopK(emb, k = 3, bands = 16,
        r = 6, queryPred = col("vec_id") < 100 && sampPred)
        .select("qid", "nid")).count()
      val sIvf = sExact.intersect(Ivf.topK(emb, k = 3, nCells = 16,
        iters = 2, nprobe = 4, queryPred = col("vec_id") < 100 && sampPred)
        .select("qid", "nid")).count()
      sExact.unpersist()
      val sEmb = emb.filter(sampPred)
      val sPairs = Similarity.cosinePairs(sEmb, tnum = 9, tden = 20).cache()
      val sNP = sPairs.count()
      val sPH = sPairs.intersect(Similarity.lshCosinePairs(sEmb,
        bands = 64, r = 8, tnum = 9, tden = 20)).count()
      sPairs.unpersist()
      // Locale.ROOT: the f-interpolator's %.1f under a comma-decimal
      // default locale would emit "66,7" and corrupt the JSON line
      // (the same bug class Bench.render fixed)
      def pct(h: Long, n: Long): String = String.format(
        java.util.Locale.ROOT, "%.1f",
        Double.box(if (n == 0) 100.0 else h * 100.0 / n))
      println(s"""{"probe":"recall","sf":"$d","ann_lsh":${pct(lshHits, nExact)},"ann_ivf":${pct(ivfHits, nExact)},"ann_q8":${pct(q8Hits, nExact)},"ann_pq":${pct(pqHits, nExact)},"ann_ivfpq":${pct(ivfpqHits, nExact)},"ann_ivfpq_refine":${pct(refineHits, nExact)},"embedding_lsh":${pct(pairHits, nPairs)},"semantic":${pct(semHits, nPairs)},"semantic2":${pct(sem2Hits, nPairs)},"n_exact_topk":$nExact,"n_exact_pairs":$nPairs,"s_ann_lsh":$sLsh/$sN,"s_ann_ivf":$sIvf/$sN,"s_emb_lsh":$sPH/$sNP}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
