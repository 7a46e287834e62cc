package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.DocStreams

/** Measure the corpus sink's SHIPPED admission probe
  * ([[DocStreams.admissionJoin]] + [[DocStreams.withFpPushdown]])
  * against fingerprint stores of growing size — the scale claim the
  * pushdown arm exists to make: per-batch probe cost bounded by
  * `batch keys × page rows` decoded rows at ANY store size (flat in
  * store size), vs the scan_semi arm's O(store) scan — and, per batch
  * size, the decode CROSSOVER the default gate pins
  * (`graft.sink.fpCrossover`): pushdown wins while
  * `batch keys × page rows < crossover × store keys`, scan_semi wins
  * beyond, because a dense-enough probe touches every page anyway and
  * the linear scan amortizes better.
  *
  * Stores are written through the sink's own layout (one consolidated
  * `batch_id=` partition via the same sorted / 1000-row-page /
  * bloom-filtered writer the sink and [[DocStreams.compactFpStore]]
  * use — exercised here through `compactFpStore` itself so the probe
  * measures the shipped write path too). The batch is half present /
  * half absent keys, the dedup probe's worst case for stats-only
  * skipping (absent keys are where the blooms earn their bytes).
  *
  * Usage: `sbt "runMain graft.tools.AdmissionScaleProbe
  *   [storeRows1,...] [batchDocs1,...] [reps] [eqChunkKeys1,...]"`
  * Defaults: 2000000,20000000 store keys; 10000 batch docs; 3 reps;
  * no eq-group sweep. A batch above `graft.sink.fpPushdownKeys`
  * (100k) exercises the WAVED pushdown path. A non-empty 4th arg
  * re-times the forced pushdown arm once per `fpEqChunkKeys` setting
  * (the In-group size [[DocStreams.chunkPredicate]] shapes the
  * parquet filter tree with) so the default can be pinned to the
  * measured flat bottom rather than "an order of magnitude below the
  * overflow".
  */
object AdmissionScaleProbe {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("2000000,20000000")
      .split(",").map(_.trim.toLong).toSeq
    val batchSizes = (if (args.length > 1) args(1) else "10000")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val sweepEq = (if (args.length > 3) args(3) else "")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val spark = SparkSession.builder()
      .appName("graft-admission-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // SPARK_GRAFT_PROBE_REUSE=1 keeps (and reuses) the generated
    // stores across runs — a 600M-key store is ~10 GB and several
    // minutes of generation; iterating on the arms shouldn't pay it
    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1")
    for (n <- sizes) {
      val dir = s"/tmp/graft_admission_probe_$n"
      val root = new org.apache.hadoop.fs.Path(dir)
      val files = math.max(4, (n / 4000000L).toInt)
      // reuse only a CLEANLY consolidated store: the fold target must
      // exist AND no raw positive-id partition may survive beside it —
      // a prior run killed between the fold's partition write and the
      // manifest apply (or mid-generation after a partial fold) leaves
      // batch_id=0/1 coexisting with -1, and a union over both would
      // double-count keys and silently skew the measured decode ratios
      val cleanlyFolded = {
        val fpRoot = new org.apache.hadoop.fs.Path(s"$dir/fp")
        fs.exists(new org.apache.hadoop.fs.Path(fpRoot, "batch_id=-1")) &&
          !fs.listStatus(fpRoot).exists(st => st.isDirectory &&
            st.getPath.getName.stripPrefix("batch_id=").toLongOption
              .exists(_ >= 0L))
      }
      if (reuse && cleanlyFolded) ()
      else {
        fs.delete(root, true)
        // store keys = md5(0..n) raw bytes, in the sink's own layout:
        // write a provisional partition, then fold it through
        // compactFpStore so the measured files are EXACTLY what a
        // compacted production store holds
        spark.range(n)
          .select(unhex(md5(col("id").cast("string"))).as("fpb"))
          .write.parquet(s"$dir/fp/batch_id=0")
        spark.range(1) // a second partition so the fold has work to do
          .select(unhex(md5(lit("seed"))).as("fpb"))
          .write.parquet(s"$dir/fp/batch_id=1")
        DocStreams.compactFpStore(spark, dir, nFiles = files)
      }
      val fpBytes = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/fp"))
        .filter(_.isDirectory)
        .flatMap(d => fs.listStatus(d.getPath))
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum

      for (nDocs <- batchSizes) {
        // batch: half present (ids inside [0,n)), half absent ([n,2n))
        val batch = spark.range(nDocs)
          .select((col("id") * (2L * n / nDocs)).as("probe_id"))
          .select(col("probe_id").as("doc_id"),
            md5(col("probe_id").cast("string")).as("fp"))
          .cache()
        // absent keys = ids landing in [n, 2n); the seed fold's
        // singleton key never collides with an id string's md5
        val expectAdmitted = batch.filter(col("doc_id") >= n).count()

        def runArm(conf: (String, String)*): (Double, String, Long) = {
          conf.foreach { case (k, v) => spark.conf.set(k, v) }
          try {
            var arm = ""; var admitted = 0L
            val t = timeIt {
              val (df, a) =
                DocStreams.admissionJoin(batch, s"$dir/fp", 999L, fpBytes)
              arm = a
              admitted = DocStreams.withFpPushdown(spark)(df.count())
            }
            (t, arm, admitted)
          } finally conf.foreach { case (k, _) => spark.conf.unset(k) }
        }

        // what the SHIPPED cost gate picks at this (store, batch) —
        // the crossover documentation the gate's default is pinned to
        val (_, defaultArm, _) = runArm("graft.sink.fpBroadcastBytes" -> "0")

        // forcing the pushdown arm FAR past the crossover is hopeless
        // by construction (decode bound = batch x page rows, many
        // multiples of one linear scan — measured 36x slower at 150x,
        // executor-OOM territory beyond): skip the forced arm there and
        // report it, the way FpPushdownProbe skips past the stack
        // bound. Page rows come from the SAME conf the shipped gate
        // and writeFpPartition use, so a tuned fpPageRows run computes
        // its ratio against the store it actually wrote.
        val pageRows = spark.conf.getOption("graft.sink.fpPageRows")
          .map(_.toInt).getOrElse(1000)
        val decodeRatio =
          nDocs.toDouble * pageRows / math.max(1L, fpBytes / 16L)
        val pushHopeless = decodeRatio > 4.0
        var tPush = Double.MaxValue; var tSemi = Double.MaxValue
        var aPush = -1L; var aSemi = -1L
        var pushArm = ""
        for (r <- 1 to reps) {
          // alternate arm order per rep (order bias control)
          val order =
            if (r % 2 == 1) Seq("push", "semi") else Seq("semi", "push")
          // both arms forced onto the LARGE-store path (broadcast gate
          // 0); the crossover gate is overridden in BOTH directions so
          // each arm runs regardless of what the default would pick
          order.foreach {
            case "push" if !pushHopeless =>
              val (t, arm, a) = runArm(
                "graft.sink.fpBroadcastBytes" -> "0",
                "graft.sink.fpCrossover" -> "1e15",
                "graft.sink.fpDriverCapKeys" -> "100000000")
              require(arm == "pushdown" || arm == "pushdown_waves", arm)
              pushArm = arm; aPush = a
              tPush = math.min(tPush, t)
            case "push" => ()
            case "semi" =>
              val (t, arm, a) = runArm("graft.sink.fpBroadcastBytes" -> "0",
                "graft.sink.fpPushdownKeys" -> "0")
              require(arm == "scan_semi", arm); aSemi = a
              tSemi = math.min(tSemi, t)
          }
        }
        if (!pushHopeless)
          require(aPush == aSemi,
            s"arms disagree: pushdown=$aPush scan_semi=$aSemi")
        val pushCell =
          if (pushHopeless) f"push skipped (${decodeRatio}%.1fx crossover)"
          else f"$pushArm%-14s $tPush%7.3f s"
        println(f"store=$n%-10d (${fpBytes / 1e6}%.0f MB, $files files)  " +
          f"batch=$nDocs%-7d admitted=$aSemi (expect ~$expectAdmitted)  " +
          f"$pushCell   scan_semi $tSemi%7.3f s   " +
          f"default gate -> $defaultArm")
        // eq-group sweep: the forced pushdown arm re-timed per
        // fpEqChunkKeys setting, same store, same batch, min-of-reps;
        // admitted counts must agree across all settings (grouping is
        // a filter-tree shape, never a semantics knob)
        for (eq <- sweepEq if !pushHopeless) {
          var t = Double.MaxValue; var a = -1L
          for (_ <- 1 to reps) {
            val (tt, arm, aa) = runArm(
              "graft.sink.fpBroadcastBytes" -> "0",
              "graft.sink.fpCrossover" -> "1e15",
              "graft.sink.fpDriverCapKeys" -> "100000000",
              "graft.sink.fpEqChunkKeys" -> eq.toString)
            require(arm == "pushdown" || arm == "pushdown_waves", arm)
            t = math.min(t, tt); a = aa
          }
          require(a == aSemi, s"eq=$eq disagrees: pushdown=$a semi=$aSemi")
          println(f"  eqChunkKeys=$eq%-5d pushdown $t%7.3f s  admitted=$a")
        }
        batch.unpersist()
      }
      if (!reuse) fs.delete(root, true)
    }
    spark.stop()
  }
}
