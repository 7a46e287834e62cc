package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence for the corpus-sink fingerprint probe's point-predicate
  * arm (the r15 weak mark): is probing a compacted, `fpb`-sorted,
  * bloom-filtered fingerprint store with the micro-batch's key set
  * pushed down as a data-source `In` predicate flat in STORE size,
  * where the scan-the-store arm is linear?
  *
  * Per store size it seeds a store in [[graft.streaming.DocStreams]]'s
  * compacted shape (one `batch_id=-1` partition, globally range-sorted
  * 16-byte `fpb` keys, parquet bloom filters on `fpb`) and times, each
  * min-of-`reps`:
  *
  *   scan_semi — the r15 large-store arm: broadcast SEMI of the batch
  *               keys into a full (column-pruned) store scan.
  *   push_in   — the candidate arm: `fpb isInCollection <batch keys>`,
  *               translated to a parquet `FilterApi.in`, so row-group
  *               stats + column-index pages + blooms skip row groups
  *               and pages that hold none of the batch's keys.
  *
  * Both arms are asserted to return the SAME hit count (half the batch
  * keys are seeded present, half absent) before any timing is trusted.
  * Order alternates per rep (memory-state bias control, the LoadProbe
  * convention).
  *
  * The flat-in-store-size regime needs store PAGES >> batch keys (a
  * page that holds none of the batch's keys is the unit the column
  * index skips), so the probe also takes the page row limit the store
  * is written with — at a real 10^9-key store the parquet default
  * (20k rows/page -> ~50k pages) is already far above any micro-batch.
  *
  * Usage: `sbt "runMain graft.tools.FpPushdownProbe [rows1,rows2,...] [batchKeys] [reps] [pageRowLimit] [chunkSize] [nFiles]"`
  * Defaults: 2000000,20000000 rows, 10000 keys, 3 reps, parquet default pages, 1000-key chunks.
  */
object FpPushdownProbe {

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "2000000,20000000")
      .split(",").map(_.trim.toLong).toSeq
    val nKeys = if (args.length > 1) args(1).toInt else 10000
    val reps = if (args.length > 2) args(2).toInt else 3
    val pageRows = if (args.length > 3) Some(args(3).toInt) else None
    val chunkSz = if (args.length > 4) args(4).toInt else 1000
    val filesOverride = if (args.length > 5) Some(args(5).toInt) else None
    val spark = SparkSession.builder()
      .appName("graft-fp-pushdown-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (n <- sizes) {
      val dir = s"${sys.props("java.io.tmpdir")}/graft-fp-push-$n"
      val fp = new org.apache.hadoop.fs.Path(dir)
      val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(fp, true)
      // store keys = md5(0..n); batch keys = md5 of n/2-spaced probes
      // (half land inside [0,n) = present, half in [n,2n) = absent)
      val files = filesOverride.getOrElse(math.max(4, (n / 4000000L).toInt))
      val writer = spark.range(n)
        .select(unhex(md5(col("id").cast("string"))).as("fpb"))
        .repartitionByRange(files, col("fpb"))
        .sortWithinPartitions("fpb")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#fpb", "true")
        .option("parquet.bloom.filter.expected.ndv#fpb",
          math.max(1L, n / files).toString)
      pageRows.fold(writer)(p =>
          writer.option("parquet.page.row.count.limit", p.toString))
        .parquet(s"$dir/fp/batch_id=-1")
      val keyRows = spark.range(nKeys)
        .select(unhex(md5((col("id") * (2L * n / nKeys)).cast("string")))
          .as("fpb"))
        .collect().map(_.getAs[Array[Byte]](0)).toSeq
      val store = spark.read.parquet(s"$dir/fp").select(col("fpb"))

      val batchDf = spark.createDataFrame(
        spark.sparkContext.parallelize(keyRows.map(org.apache.spark.sql.Row(_)), 4),
        new org.apache.spark.sql.types.StructType()
          .add("fpb", org.apache.spark.sql.types.BinaryType))

      def scanSemi(): Long =
        store.join(broadcast(batchDf), Seq("fpb"), "left_semi").count()
      def pushIn(): Long =
        store.filter(col("fpb").isInCollection(keyRows)).count()
      // or-of-eq arm: above the In threshold parquet-mr evaluates a
      // pushed In against the column index as RANGE(min(set),max(set))
      // (ColumnIndexBase.visit(In) builds a MinMax) — useless for
      // uniform hash keys. BELOW the threshold Spark pushes or(eq...),
      // and Eq gets true per-page boundary search + bloom probes.
      def pushEq(): Long = {
        val k = "spark.sql.parquet.pushdown.inFilterThreshold"
        val old = spark.conf.get(k)
        spark.conf.set(k, (nKeys + 1).toString)
        try store.filter(col("fpb").isInCollection(keyRows)).count()
        finally spark.conf.set(k, old)
      }
      // chunked or-of-eq: parquet's filter visitors recurse once per
      // or() level, so a single deep chain overflows the task stack
      // (measured: 10k keys dies, see round notes); unioning one scan
      // leg per <=chunk keys keeps every predicate tree shallow while
      // total decoded pages stay bounded by the key count
      def pushEqChunked(chunk: Int): Long = {
        val k = "spark.sql.parquet.pushdown.inFilterThreshold"
        val old = spark.conf.get(k)
        spark.conf.set(k, (chunk + 1).toString)
        try keyRows.grouped(chunk)
          .map(ch => store.filter(col("fpb").isInCollection(ch)))
          .reduce(_ union _).count()
        finally spark.conf.set(k, old)
      }
      // sorted-contiguous chunking: chunk i's or(eq...) covers a NARROW
      // contiguous slice of the (sorted) key space, so row-group
      // min/max stats prune every group outside the slice — each chunk
      // scan touches ~1/nChunks of the store's row groups and the
      // union's total metadata+page reads collapse to ~one pass,
      // where random chunking re-reads every footer per chunk
      def pushEqSorted(chunk: Int): Long = {
        val sorted = keyRows.sortWith((a, b) =>
          java.util.Arrays.compareUnsigned(a, b) < 0)
        val k = "spark.sql.parquet.pushdown.inFilterThreshold"
        val old = spark.conf.get(k)
        spark.conf.set(k, (chunk + 1).toString)
        try sorted.grouped(chunk)
          .map(ch => store.filter(col("fpb").isInCollection(ch)))
          .reduce(_ union _).count()
        finally spark.conf.set(k, old)
      }
      // column-index ablation: same pushed In, but with parquet's
      // column-index (page-level) filtering off, so only row-group
      // stats + blooms skip — the gap between this and push_in is the
      // page-skip contribution
      def pushInNoCi(): Long = {
        val hc = spark.sparkContext.hadoopConfiguration
        val old = hc.get("parquet.filter.columnindex.enabled")
        hc.set("parquet.filter.columnindex.enabled", "false")
        try store.filter(col("fpb").isInCollection(keyRows)).count()
        finally {
          if (old == null) hc.unset("parquet.filter.columnindex.enabled")
          else hc.set("parquet.filter.columnindex.enabled", old)
        }
      }

      val a = scanSemi(); val b = pushIn()
      require(a == b, s"arm disagreement: scan_semi=$a push_in=$b")
      println(s"n=$n hits=$a (expect ~${nKeys / 2})")
      // decoded-row evidence: the scan's numOutputRows after parquet-
      // level filtering (row groups + column-index pages) — flatness
      // comes from this number, not from wall-clock luck
      locally {
        def decoded(label: String): Unit = {
          val qe = store.filter(col("fpb").isInCollection(keyRows))
            .queryExecution // scan+filter only: no exchange, no AQE wrapper
          qe.toRdd.count()
          qe.executedPlan.collectLeaves().foreach { l =>
            l.metrics.get("numOutputRows").foreach(m =>
              println(s"n=$n $label scan numOutputRows=${m.value}"))
          }
        }
        decoded("push_in")
        // a single or(eq...) chain of >4000 keys overflows the task
        // stack in parquet's recursive filter visitors (same gate as
        // eqArm below) — above it the chunked variant stands in
        if (nKeys <= 4000) {
          val k = "spark.sql.parquet.pushdown.inFilterThreshold"
          val old = spark.conf.get(k)
          spark.conf.set(k, (nKeys + 1).toString)
          try decoded("push_eq") finally spark.conf.set(k, old)
        } else {
          val k = "spark.sql.parquet.pushdown.inFilterThreshold"
          val old = spark.conf.get(k)
          spark.conf.set(k, 1001.toString)
          try {
            def unionDecoded(label: String, keys: Seq[Array[Byte]]): Unit = {
              val qe = keys.grouped(1000)
                .map(ch => store.filter(col("fpb").isInCollection(ch)))
                .reduce(_ union _).queryExecution
              qe.toRdd.count()
              val total = qe.executedPlan.collectLeaves()
                .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
              println(s"n=$n $label scan numOutputRows=$total (summed over chunks)")
            }
            unionDecoded("push_eq_chunked", keyRows)
            unionDecoded("push_eq_sorted", keyRows.sortWith((x, y) =>
              java.util.Arrays.compareUnsigned(x, y) < 0))
          } finally spark.conf.set(k, old)
        }
      }
      if (n == sizes.head) {
        println("--- push_in scan metadata ---")
        store.filter(col("fpb").isInCollection(keyRows))
          .queryExecution.executedPlan.collectLeaves().foreach {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              val pf = f.metadata.getOrElse("PushedFilters", "?")
              println(s"PushedFilters(len=${pf.length}): ${pf.take(200)}")
            case other => println(s"leaf: ${other.nodeName}")
          }
      }
      var tScan = Double.MaxValue; var tPush = Double.MaxValue
      var tEq = Double.MaxValue; var tChunk = Double.MaxValue
      var tNoCi = Double.MaxValue; var tSorted = Double.MaxValue
      def eqArm(): Unit = if (nKeys <= 4000)
        tEq = math.min(tEq, timeIt { val c = pushEq(); require(c == a, s"push_eq=$c != $a") })
      def chunkArm(): Unit =
        tChunk = math.min(tChunk, timeIt { val c = pushEqChunked(chunkSz); require(c == a, s"push_eq_chunked=$c != $a") })
      def sortedArm(): Unit =
        tSorted = math.min(tSorted, timeIt { val c = pushEqSorted(chunkSz); require(c == a, s"push_eq_sorted=$c != $a") })
      def noCiArm(): Unit =
        tNoCi = math.min(tNoCi, timeIt { val c = pushInNoCi(); require(c == a, s"push_in_noci=$c != $a") })
      for (r <- 1 to reps) {
        if (r % 2 == 1) {
          tScan = math.min(tScan, timeIt(scanSemi()))
          tPush = math.min(tPush, timeIt(pushIn()))
          noCiArm(); eqArm(); chunkArm(); sortedArm()
        } else {
          sortedArm(); chunkArm(); eqArm(); noCiArm()
          tPush = math.min(tPush, timeIt(pushIn()))
          tScan = math.min(tScan, timeIt(scanSemi()))
        }
      }
      def fmt(t: Double): String =
        if (t == Double.MaxValue) "skipped" else f"$t%7.3f s"
      println(f"n=$n%-10d scan_semi ${fmt(tScan)}   push_in ${fmt(tPush)}" +
        s"   push_in_noci ${fmt(tNoCi)}   push_eq ${fmt(tEq)}" +
        s"   push_eq_chunked($chunkSz) ${fmt(tChunk)}" +
        s"   push_eq_sorted($chunkSz) ${fmt(tSorted)}")
    }
    spark.stop()
  }
}
