package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Pq, Similarity}
import graft.queries.Tables

/** One-off calibration sweep for the IVF-PQ probe width: recall vs
  * nprobe at fixed m/ks/nCells, per SF dir. The candidate cost of an
  * ADC-scored candidate is an m-entry lookup-sum (~free next to an
  * exact dot), so the IVFADC composition conventionally probes MORE
  * cells than exact-ranking IVF — this prints the curve the driver
  * `nprobe` is chosen from.
  */
object IvfPqSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val exact = Similarity.bruteForceTopK(emb, k = 3,
        queryPred = col("vec_id") < 100).select("qid", "nid").cache()
      val n = exact.count()
      val parts = for (np <- Seq(4, 6, 8, 10)) yield {
        val hits = exact.intersect(
          Pq.topKIvf(emb, k = 3, m = 32, ks = 32, iters = 2,
            nCells = 16, nprobe = np, queryPred = col("vec_id") < 100)
            .select("qid", "nid")).count()
        s""""np$np":${String.format(java.util.Locale.ROOT, "%.1f",
          Double.box(hits * 100.0 / n))}"""
      }
      exact.unpersist()
      println(s"""{"sweep":"ivfpq","sf":"$d",${parts.mkString(",")}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
