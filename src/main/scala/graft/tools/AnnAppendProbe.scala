package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{AnnIndex, Pq, Similarity}

/** Measures the incremental-maintenance claim behind
  * [[graft.pipeline.Ivf.appendIndex]]/[[graft.pipeline.Pq.appendIndexIvf]]:
  * appending a CONSTANT-size batch to a persisted IVF-PQ index must cost
  * the same whatever the indexed corpus size (batch-proportional — one
  * broadcast assign + encode pass over batch rows only), while the
  * alternative — full retrain on corpus+batch — grows with the corpus.
  * The gap between the two curves is the daily-ingest economics: at 1e9
  * vectors a retrain-per-batch pipeline pays the k-means and full
  * re-encode every day for a <1% corpus delta.
  *
  * At each factor f ([[AnnScaleProbe.scaledCorpus]] tiling, nCells ∝ f):
  *  - build the IVF-PQ index on the f× corpus (reported for context);
  *  - time appendIndexIvf of the SAME ~2k-vector batch (a distinct
  *    rotation/id-offset of the base corpus, constant across factors);
  *  - time the full rebuild on corpus+batch (what the append avoids);
  *  - report post-append probe recall vs the pre-append index's
  *    queries to show the appended vectors are findable (candidate
  *    coverage, not silent loss).
  *
  * Usage: runMain graft.tools.AnnAppendProbe [factor ...] (default 1 4 10)
  */
object AnnAppendProbe {
  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"${sys.props("java.io.tmpdir")}/graft-ann-append"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the constant batch: base corpus rotated by 32, ids offset past
    // every tiled copy — the same rows at every factor
    val batch = {
      val b = graft.queries.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      b.select((col("vec_id") + lit(900000000L)).as("vec_id"),
        concat(slice(col("embedding"), 33, 32),
          slice(col("embedding"), 1, 32)).as("embedding"))
    }
    println(f"${"factor"}%8s ${"corpus"}%8s ${"batch"}%7s ${"build_s"}%8s " +
      f"${"append_s"}%9s ${"rebuild_s"}%10s ${"probe_rows"}%11s")
    for (f <- factors) {
      val path = AnnScaleProbe.scaledCorpus(spark, sfDir, f, root)
      val emb = spark.read.parquet(path)
      val n = emb.count()
      val bn = batch.count()
      val nCells = 16 * f
      val dir = s"$root/idx-f$f"
      val buildT = timeIt {
        Pq.buildIndexIvf(emb, dir, m = 32, ks = 32, iters = 2,
          nCells = nCells)
      }
      val appendT = timeIt {
        require(Pq.appendIndexIvf(batch, dir, m = 32, ks = 32, iters = 2,
          nCells = nCells, maxGrowth = 3.0), "append gated unexpectedly")
      }
      require(AnnIndex.readMeta(spark, dir).get.n == n + bn, "meta drift")
      // what the append avoided: retrain+re-encode on corpus+batch
      val rebuildT = timeIt {
        Pq.buildIndexIvf(emb.unionByName(batch), s"$root/idx-rebuild-f$f",
          m = 32, ks = 32, iters = 2, nCells = nCells)
      }
      // appended vectors must be findable: probe AS the batch (each
      // batch vector queries the appended index) — every query returns
      // k ranked candidates from the merged index
      val probeRows = Pq.probeIndexIvf(dir,
        Similarity.prepared(batch).filter(col("vec_id") < 900001000L),
        k = 3, m = 32, nprobe = math.min(nCells, 8)).count()
      println(f"$f%8d $n%8d $bn%7d $buildT%8.2f $appendT%9.2f " +
        f"$rebuildT%10.2f $probeRows%11d")
    }
    spark.stop()
  }
}
