package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B the eager cache-release in [[graft.pipeline.Similarity]]
  * (`releasedAfter`: localCheckpoint the result, unpersist the corpus
  * cache) against the prior lazy semantics, on the bench entries that
  * regressed the round it shipped — plus an UNTOUCHED control
  * (`dedup_minhash`, no embedding path) to separate the change's cost
  * from host noise, which on this box uniformly inflates whole windows
  * by 20-30%.
  *
  * Arms alternate WITHIN each rep (A, B, A, B ...) in one JVM so both
  * see the same noise window; the caches the B arm leaks are dropped
  * between measurements (`catalog.clearCache`). Reports per-entry
  * medians and the A/B ratio.
  *
  * Usage: `sbt "runMain graft.tools.ReleaseAbProbe [sfDir] [reps]"`.
  */
object ReleaseAbProbe {

  private val Entries = Seq(
    "dedup_embedding_lsh", "embedding_lsh_recall", "dedup_semantic",
    "dedup_minhash") // control: no Similarity path, unchanged in r13

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .appName("graft-release-ab-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fns = SparkEntry.queries
    def runOne(name: String, skip: Boolean): Double = {
      if (skip) sys.props("graft.release.skip") = "true"
      else sys.props.remove("graft.release.skip")
      try {
        val t0 = System.nanoTime()
        fns(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } finally {
        // ALWAYS clear the flag: a thrown rep must not leave later
        // "shipped" runs silently measuring the lazy arm
        sys.props.remove("graft.release.skip")
        spark.catalog.clearCache() // drop anything the lazy arm leaked
      }
    }

    // warmup both arms once (codegen, scan caches OS-side)
    Entries.foreach { e => runOne(e, skip = false); runOne(e, skip = true) }

    val a = Entries.map(_ -> collection.mutable.Buffer[Double]()).toMap
    val b = Entries.map(_ -> collection.mutable.Buffer[Double]()).toMap
    for (r <- 1 to reps; e <- Entries) {
      // alternate arm ORDER per rep: the second run of a pair rides the
      // first's OS page cache / JIT warmth (the control entry measured
      // a 1.67x pure-order bias when shipped always ran first), so each
      // arm must sit in each slot equally often
      if (r % 2 == 1) {
        a(e) += runOne(e, skip = false); b(e) += runOne(e, skip = true)
      } else {
        b(e) += runOne(e, skip = true); a(e) += runOne(e, skip = false)
      }
      println(f"rep $r $e%-22s shipped ${a(e).last}%6.2f s   lazy ${b(e).last}%6.2f s")
    }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    println("\nentry                    shipped(med)  lazy(med)  shipped/lazy")
    Entries.foreach { e =>
      val (ma, mb) = (med(a(e).toSeq), med(b(e).toSeq))
      println(f"$e%-24s ${ma}%9.2f s ${mb}%8.2f s  ${ma / mb}%8.2f")
    }
    spark.stop()
  }
}
