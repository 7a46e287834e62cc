package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.DocStreams

/** Measure [[DocStreams.compactFpStore]]'s size-ratio LADDER against
  * the pre-ladder tiered scheme (incremental-only passes + a full
  * fold every `fullFoldAt` generations) over a long-lived sink's
  * maintenance lifetime — the bound the ladder exists to make:
  *
  *   - **typical pass cost stays at the batch tier**, and a tier-k
  *     bucket merge happens only once per ~ratio^k passes
  *     (geometrically rare) — the tiered scheme's full fold rewrites
  *     the WHOLE CURRENT store every `fullFoldAt` generations
  *     forever, a scheduled periodic ~160 GB maintenance job at a
  *     10¹⁰-key store that a micro-batch sink never runs
  *     deliberately;
  *   - **total read amplification stays comparable** (each key climbs
  *     the ladder O(log_ratio(store/batch)) times — the classic LSM
  *     size-tiered trade; measured 4.82× vs the tiered arm's 4.63×
  *     over 128 passes).
  *
  * The probe replays the SHIPPED maintenance loop: `nBatches`
  * micro-batch fp partitions land one at a time (plain parquet, the
  * raw-partition shape the sink writes before its first fold), and
  * every `cadence` batches one `compactFpStore` pass runs — exactly
  * what [[DocStreams.maybeMaintain]]'s daemon does at
  * `graft.sink.maintainEvery`. Per pass it records the folded source
  * bytes (the method's return — bytes READ and REWRITTEN by that
  * pass) and the live generation count; per arm it reports the max
  * pass, the total, total/final-store (read amplification), and the
  * final generation count. Store growth across the run is
  * `nBatches/cadence`× the first fold's input (128× at the defaults),
  * so the tiered arm pays many linearly-growing full folds while the
  * ladder's tier merges stay geometric.
  *
  * Usage: `sbt "runMain graft.tools.FoldLadderProbe
  *   [nBatches] [keysPerBatch] [cadence]"`
  * Defaults: 1024 batches × 10k keys, cadence 8 (128 maintenance
  * passes, final store 10.24M keys ≈ 181 MB — the SCALE.md table's
  * run; long enough that the tiered arm pays several of its
  * linearly-growing full folds while the ladder's tier merges stay
  * geometric). The r20 decade-up anchor ran `2560 50000 8` (320
  * passes, final store 128M keys ≈ 2.16 GB): ladder read amp 4.89x
  * (vs 4.82x at 1/12th scale — flat), max pass 594 MB (the merging
  * tier-3 bucket, 27% of store), while the tiered arm's amp grew
  * 4.63x -> 10.73x with a 2,058 MB whole-store max pass — the
  * SCALE.md decade-up table.
  */
object FoldLadderProbe {

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(1024)
    val keysPerBatch = if (args.length > 1) args(1).toInt else 10000
    val cadence = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .appName("graft-fold-ladder-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def storeStats(dir: String): (Long, Int) = {
      val fpRoot = new org.apache.hadoop.fs.Path(s"$dir/fp")
      val parts = fs.listStatus(fpRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      val bytes = parts.flatMap(p => fs.listStatus(p.getPath))
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
      val gens = parts.count(_.getPath.getName.stripPrefix("batch_id=")
        .toLongOption.exists(_ < 0L))
      (bytes, gens)
    }

    // arm → (maintenance pass invocation). Both arms run the same
    // batch schedule; only the fold policy differs.
    case class Arm(name: String, ratio: String, fullFoldAt: Int)
    val arms = Seq(
      Arm("tiered_r18", ratio = "0", fullFoldAt = 16),      // pre-ladder scheme
      Arm("ladder", ratio = "4", fullFoldAt = Int.MaxValue)) // shipped default

    for (arm <- arms) {
      val dir = s"/tmp/graft_fold_ladder_${arm.name}"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.conf.set("graft.sink.fpFoldRatio", arm.ratio)
      val passes = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
      try {
        for (b <- 0 until nBatches) {
          spark.range(b.toLong * keysPerBatch, (b + 1L) * keysPerBatch)
            .select(unhex(md5(col("id").cast("string"))).as("fpb"))
            .coalesce(1)
            .write.parquet(s"$dir/fp/batch_id=$b")
          if ((b + 1) % cadence == 0) {
            val t0 = System.nanoTime()
            val folded = DocStreams.compactFpStore(
              spark, dir, nFiles = -1, graceMs = 0L,
              fullFoldAt = arm.fullFoldAt)
            val secs = (System.nanoTime() - t0) / 1e9
            val (_, gens) = storeStats(dir)
            passes += ((folded, gens, secs))
          }
        }
      } finally spark.conf.unset("graft.sink.fpFoldRatio")
      val (finalBytes, finalGens) = storeStats(dir)
      val total = passes.map(_._1).sum
      val maxPass = passes.map(_._1).max
      println(f"arm=${arm.name}%-11s passes=${passes.size}%3d  " +
        f"final store=${finalBytes / 1e6}%6.1f MB ($finalGens gens)  " +
        f"max pass=${maxPass / 1e6}%6.1f MB  total folded=${total / 1e6}%7.1f MB  " +
        f"read amp=${total.toDouble / finalBytes}%5.2fx  " +
        f"fold time total=${passes.map(_._3).sum}%6.1f s")
      println("  pass bytes (MB): " +
        passes.map(p => f"${p._1 / 1e6}%.0f").mkString(" "))
      println("  gens after pass: " + passes.map(_._2).mkString(" "))
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    spark.stop()
  }
}
