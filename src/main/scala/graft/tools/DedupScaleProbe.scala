package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.queries.Tables

/** Measures how the web-scale dedup paths scale with corpus size — the
  * number behind SCALE.md's "nothing here is ever all-pairs" claim. The
  * shipped documents top out at 5k rows (sf0.1), so scale factor f
  * tiles the corpus f times; copy c ROTATES each document's token
  * sequence by c positions (deterministic, near-free in SQL), which
  * destroys shingle overlap between copies — so the organic near-dup
  * structure repeats per copy (pair count grows ∝ f, never f²) and any
  * super-linear time growth is the ALGORITHM's, not the data's.
  *
  * Probes, per scale (min of `reps`):
  *  - MinHash-LSH near-dup (`dedup_minhash` parameters: n=3, k=64,
  *    bands=32, J >= 3/5) — banded candidates + verify; the designated
  *    web-scale route, expected ~linear.
  *  - Exact hash dedup groups (`Dedup.exact(byHash)`) — one shuffle,
  *    expected ~linear with a fixed floor.
  *
  * Usage: runMain graft.tools.DedupScaleProbe [factor ...] (default 1 4 10)
  */
object DedupScaleProbe {
  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** f tiled copies: copy c PREFIXES every token with the copy id (and
    * offsets doc_id). Every shingle of every copy differs from every
    * other copy's, so cross-copy Jaccard is exactly 0 and the organic
    * near-dup structure simply repeats per copy — pair count grows ∝ f.
    * (A token ROTATION does the opposite: rotating a 100-token document
    * by a few positions keeps ~95% of its shingles, making all copies
    * of a document mutual near-dups — an f² pathological corpus.)
    */
  private def scaledCorpus(spark: SparkSession, sfDir: String, f: Int,
                           root: String): String = {
    val path = s"$root/docs-f$f"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val copies = (0 until f).map { c =>
        val tagged =
          if (c == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", s"c$c$$1")
        base.select((col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          tagged.as("text"))
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
    val root = s"${sys.props("java.io.tmpdir")}/graft-dedup-scale"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"factor"}%8s ${"docs"}%8s ${"mh_pairs"}%9s " +
      f"${"minhash_s"}%10s ${"exact_s"}%8s")
    for (f <- factors) {
      val path = scaledCorpus(spark, sfDir, f, root)
      def docs: DataFrame = spark.read.parquet(path)
      val n = docs.count()
      var pairs = -1L
      val mhT = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt {
          pairs = Dedup.minhashNearDups(docs, n = 3, k = 64, bands = 32,
            tnum = 3, tden = 5).count()
        }
      }.min
      val exT = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        timeIt { Dedup.exact(docs, byHash = true).count() }
      }.min
      println(f"$f%8d $n%8d $pairs%9d $mhT%10.2f $exT%8.2f")
    }
    spark.stop()
  }
}
