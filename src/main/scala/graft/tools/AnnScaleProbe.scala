package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Ivf, Pq, Similarity}
import graft.queries.Tables

/** Measures how the PERSISTED ANN index lifecycle scales with corpus
  * size — the number behind SCALE.md's claim that probe cost tracks the
  * probed cells, not the corpus. The shipped testdata tops out at 2k
  * vectors (sf0.1), so each scale factor f tiles the sf0.1 embeddings f
  * times: copy c offsets vec_id and ROTATES each vector by c positions
  * (norm-preserving, so every copy is a distinct point with the same
  * magnitude distribution — no synthetic geometry beyond the driver's
  * own corpus). f=10 is the sf1-equivalent 20k-vector corpus
  * (~200M-pair class, past the 75M-pair class the round-8 ask named).
  *
  * At each scale it times, separately:
  *  - IVF-PQ index build (k-means training + packed codes — the
  *    once-per-snapshot job), with nCells grown ∝ f so the per-cell
  *    list stays constant-size (how a production deployment scales the
  *    coarse quantizer);
  *  - persisted IVF-PQ probe (1000 fixed queries, nprobe=8): the
  *    per-query scan is nprobe cells x constant cell size, so this
  *    should stay ~flat as f grows;
  *  - persisted flat-PQ probe as the contrast: ADC-scores ALL fN
  *    candidates, so it must grow ~linearly — the gap between the two
  *    curves is the scale story.
  *
  * Usage: runMain graft.tools.AnnScaleProbe [factor ...]   (default 1 4 10)
  */
object AnnScaleProbe {
  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** f tiled copies of the base corpus, written once per factor
    * (shared with [[AnnAppendProbe]]).
    */
  private[tools] def scaledCorpus(spark: SparkSession, sfDir: String, f: Int,
                                  root: String): String = {
    val path = s"$root/corpus-f$f"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val base = Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val copies = (0 until f).map { c =>
        val r = c % 64
        val rot =
          if (r == 0) col("embedding")
          else concat(
            slice(col("embedding"), r + 1, 64 - r),
            slice(col("embedding"), 1, r))
        base.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
          rot.as("embedding"))
      }
      copies.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = 3
    val root = s"${sys.props("java.io.tmpdir")}/graft-ann-scale"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"factor"}%8s ${"vectors"}%8s ${"nCells"}%7s " +
      f"${"build_s"}%8s ${"ivfpq_probe_s"}%14s ${"flatpq_probe_s"}%15s")
    for (f <- factors) {
      val path = scaledCorpus(spark, sfDir, f, root)
      val emb = spark.read.parquet(path)
      val n = emb.count()
      // attribution experiment: SPARK_GRAFT_ANN_CELLS pins nCells
      // instead of growing it with f — constant cell COUNT but f×
      // larger cells, so probe candidates grow ∝ f. Comparing the two
      // modes at the same f separates candidate-volume cost from
      // centroid-count/dir-listing cost.
      val nCells = sys.env.get("SPARK_GRAFT_ANN_CELLS")
        .flatMap(_.toIntOption).getOrElse(16 * f)
      val ivfDir = s"$root/idx-ivfpq-f$f"
      val flatDir = s"$root/idx-pq-f$f"
      val buildT = timeIt {
        Pq.buildIndexIvf(emb, ivfDir, m = 32, ks = 32, iters = 2,
          nCells = nCells)
        Pq.buildIndex(emb, flatDir, m = 32, ks = 32, iters = 2)
      }
      def probeReps(dir: String, ivf: Boolean): Double =
        (1 to reps).map { _ =>
          spark.catalog.clearCache()
          // fixed 1000-query batch from the untouched copy (copy-0 ids
          // are < 1e6): the probe workload is CONSTANT across factors,
          // so any time growth is the index side's
          val queries = Similarity.prepared(emb)
            .filter(col("vec_id") < 1000)
          timeIt {
            (if (ivf) Pq.probeIndexIvf(dir, queries, k = 3, m = 32, nprobe = 8)
             else Pq.probeIndex(dir, queries, k = 3, m = 32)).count()
          }
        }.min
      val ivfT = probeReps(ivfDir, ivf = true)
      val flatT = probeReps(flatDir, ivf = false)
      println(f"$f%8d $n%8d $nCells%7d $buildT%8.2f $ivfT%14.2f $flatT%15.2f")
    }
    spark.stop()
  }
}
