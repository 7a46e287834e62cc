package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import graft.queries.{PipelineQueries, Tables}

/** Measures the embedding-LSH near-dup cost curve with corpus growth —
  * the number behind [[Similarity.adaptiveR]]. The sf1 bench probe
  * caught fixed r=8 banding growing 77× at 10× vectors (background
  * candidates are ~bands/2^r of all n² pairs — quadratic however the
  * buckets hash); this probe isolates the pair stage and contrasts the
  * FIXED band width against the adaptive one at the same recall
  * apparatus, the same ablation shape as AnnScaleProbe's constant-cells
  * run (SCALE.md).
  *
  * Corpus: embeddings tiled f times — vec_id offset per copy, float
  * array ROTATED by copy index (norms and within-copy distances are
  * preserved exactly, so the organic near-dup structure repeats per
  * copy and true pairs grow ∝ f; cross-copy cosine decorrelates).
  *
  * With `prep=<sfDir>` as an argument, additionally times the full
  * [[PipelineQueries.pipelinePrepEmbLsh]] composition (the documented
  * production swap of the oracle-exact `pipeline_prep_emb`) against
  * that directory's documents+embeddings.
  *
  * Usage: runMain graft.tools.EmbLshScaleProbe [factor ...] [prep=<dir>]
  * (default factors 1 4 10)
  */
object EmbLshScaleProbe {
  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def tiled(spark: SparkSession, sfDir: String, f: Int): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    (0 until f).map { c =>
      val rot =
        if (c == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(c + 1), size(col("embedding")) - lit(c)),
          slice(col("embedding"), lit(1), lit(c)))
      base.select((col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        rot.as("embedding"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val prepDir = args.collectFirst { case a if a.startsWith("prep=") =>
      a.stripPrefix("prep=") }
    val factors = args.filterNot(_.startsWith("prep=")) match {
      case Array() => Seq(1, 4, 10); case a => a.toSeq.map(_.toInt)
    }
    val reps = 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"factor"}%7s ${"vecs"}%7s ${"r_auto"}%7s ${"fixed_s"}%8s " +
      f"${"fixed_pairs"}%12s ${"auto_s"}%7s ${"auto_pairs"}%11s " +
      f"${"sem_s"}%7s ${"sem_pairs"}%10s")
    for (f <- factors) {
      // materialize the tiled corpus so tiling cost is not in the timings
      val path = s"${sys.props("java.io.tmpdir")}/graft-emb-scale/f$f"
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        tiled(spark, sfDir, f).repartition(8)
          .write.mode("overwrite").parquet(path)
      def emb: DataFrame = spark.read.parquet(path)
      val n = emb.count()
      val rAuto = Similarity.adaptiveR(n, rBase = 8)
      var fixedPairs = -1L; var autoPairs = -1L
      val fixedT = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt { fixedPairs = Similarity.lshCosinePairs(emb, bands = 64,
          r = 8, tnum = 9, tden = 20).count() }
      }.min
      val autoT = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt { autoPairs = Similarity.lshCosinePairsAuto(emb, bands = 64,
          rBase = 8, tnum = 9, tden = 20).count() }
      }.min
      // SemDeDup cells under the sizing rule (nCells ∝ corpus, constant
      // expected cell size — the same rule AnnScaleProbe ablates for
      // IVF): per-cell blocks stay bounded, so cost ~linear in f; the
      // driver entry's nAssign=2 overlap is included in the cost
      var semPairs = -1L
      val semT = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt { semPairs = Similarity.semanticPairs(emb, nCells = 8 * f,
          iters = 4, tnum = 9, tden = 20, nAssign = 2).count() }
      }.min
      println(f"$f%7d $n%7d $rAuto%7d $fixedT%8.2f $fixedPairs%12d " +
        f"$autoT%7.2f $autoPairs%11d $semT%7.2f $semPairs%10d")
    }
    prepDir.foreach { d =>
      val t = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt { PipelineQueries.pipelinePrepEmbLsh(spark, d).count() }
      }.min
      println(f"prep_emb_lsh($d): $t%.2f s")
    }
    spark.stop()
  }
}
