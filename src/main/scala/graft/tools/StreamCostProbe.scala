package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis
import graft.streaming.{DocStreams, Replay}

/** Decompose a streaming replay entry's wall-clock into harness floor
  * vs operator work, so the "streaming fixed cost" conversation runs on
  * numbers instead of suspicion. For the corpus-sink feed (the most
  * expensive stream entry) it times, per variant, the min of `reps`:
  *
  *   feed      — building the replay feed (collect + wave)
  *   floor     — the same 4 micro-batches through a PASS-THROUGH
  *               stateless transform into a memory sink: query start,
  *               per-batch planning, offset/commit logs, sink — the
  *               irreducible replay harness cost
  *   dedup     — [[DocStreams.dedupExact]] alone (adds fingerprint +
  *               watermark + dedup state store)
  *   dedup_rdb — the same under the RocksDB state store provider
  *   quality   — [[DocStreams.qualityFilter]] alone (adds the per-row
  *               regex family: keep gate, langid, PII counts)
  *   sink      — the full [[DocStreams.toCorpus]] (quality + dedup +
  *               idempotent partitioned-parquet foreachBatch sink)
  *
  * Usage: `sbt "runMain graft.tools.StreamCostProbe [sfDir] [reps]"`.
  */
object StreamCostProbe {

  // public: Janino-generated encoder code cannot call accessors on a
  // private nested class and silently falls back to interpreter mode
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .appName("graft-stream-cost-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(label: String)(body: => Unit): Unit = {
      val t = (1 to reps).map(_ => timeIt(body)).min
      println(f"$label%-10s $t%8.2f s")
    }

    // the corpus-sink feed shape (StreamQueries.dedupBaseFeed + wave)
    var base: Array[(Long, String)] = null
    best("feed") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .withColumn("fp", TextAnalysis.fingerprintExpr(col("text")))
      val rn = Window.partitionBy("fp").orderBy("doc_id")
      base = docs.withColumn("rn", row_number().over(rn))
        .filter(col("rn") === 1)
        .select("doc_id", "text").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }
    val wave = base.filter(_._1 % 5 == 0).map { case (id, text) =>
      (id + 1000000L, if (id % 25 == 0) text + " v2" else text)
    }
    def toDocs(rows: Array[(Long, String)]): Seq[Doc] = rows.map {
      case (id, text) => Doc(id, text, new Timestamp(1704067200000L + id * 1000L))
    }.toSeq
    val batches = Replay.chunks(toDocs(base), 2) ++ Replay.chunks(toDocs(wave), 2)

    def run(transform: DataFrame => DataFrame): Unit = {
      val out = Replay.replay(spark, batches)(transform)
      out.count() // force the memory sink drain
      ()
    }

    best("floor") { run(identity) }
    best("dedup") { run(in => DocStreams.dedupExact(in, "30 days")) }
    val rKey = "spark.sql.streaming.stateStore.providerClass"
    best("dedup_rdb") {
      spark.conf.set(rKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try run(in => DocStreams.dedupExact(in, "30 days"))
      finally spark.conf.unset(rKey)
    }
    best("quality") { run(in => DocStreams.qualityFilter(in)) }
    // single-action sink candidate: no persist, no count — the ONLY
    // action per batch is the write itself, so the regex-heavy upstream
    // evaluates exactly once. The store probe guards on part-file
    // presence (cheap listing) instead of dir existence, which makes
    // empty appends harmless and removes the need for an emptiness
    // probe entirely.
    best("sink_1act") {
      val dir = s"${sys.props("java.io.tmpdir")}/graft-cost-probe-1act"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir-ckpt"), true)
      val data = s"$dir/data"
      Replay.replayTo(spark, batches)(in =>
        DocStreams.dedupExact(DocStreams.qualityFilter(in), "30 days")
          .writeStream
          .option("checkpointLocation", s"$dir-ckpt")
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val marker = new org.apache.hadoop.fs.Path(dir, s"_applied_$batchId")
            if (!fs.exists(marker)) {
              val one = batch
                .withColumn("__rn", row_number().over(
                  Window.partitionBy("fp").orderBy("doc_id")))
                .filter(col("__rn") === 1).drop("__rn")
              val admitted = {
                val p = new org.apache.hadoop.fs.Path(data)
                val hasStore = fs.exists(p) && fs.listStatus(p).exists { st =>
                  st.isDirectory || st.getPath.getName.endsWith(".parquet")
                }
                if (hasStore)
                  one.join(spark.read.parquet(data).select(col("fp")),
                    Seq("fp"), "left_anti")
                else one
              }
              admitted.write.mode("append")
                .partitionBy("lang_pred").parquet(data)
              fs.create(marker, true).close()
            }
          }
          .start())
      spark.read.parquet(s"$data").count()
      ()
    }
    best("sink") {
      val dir = s"${sys.props("java.io.tmpdir")}/graft-cost-probe"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir-ckpt"), true)
      Replay.replayTo(spark, batches)(in =>
        DocStreams.toCorpus(in, dir, s"$dir-ckpt", lateness = "30 days"))
      spark.read.parquet(s"$dir/data").count()
      ()
    }

    // per-step timing of the foreachBatch body itself (a probe-local
    // twin of DocStreams.corpusBatchSink with stopwatches): where do
    // the sink's seconds go — persist/isEmpty, the within-batch window,
    // the store anti-join probe, or the partitioned append?
    {
      val acc = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      def lap[A](k: String)(body: => A): A = {
        val t0 = System.nanoTime(); val r = body
        acc.merge(k, (System.nanoTime() - t0) / 1e9, (a, b) => a + b); r
      }
      val dir = s"${sys.props("java.io.tmpdir")}/graft-cost-probe-steps"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir-ckpt"), true)
      val data = s"$dir/data"
      val t0 = System.nanoTime()
      Replay.replayTo(spark, batches)(in =>
        DocStreams.dedupExact(DocStreams.qualityFilter(in), "30 days")
          .writeStream
          .option("checkpointLocation", s"$dir-ckpt")
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val marker = new org.apache.hadoop.fs.Path(dir, s"_applied_$batchId")
            if (!fs.exists(marker)) {
              lap("persist")(batch.persist())
              try {
                if (lap("count")(batch.count()) > 0) {
                  val one = batch
                    .withColumn("__rn", row_number().over(
                      Window.partitionBy("fp").orderBy("doc_id")))
                    .filter(col("__rn") === 1).drop("__rn")
                  val admitted =
                    if (fs.exists(new org.apache.hadoop.fs.Path(data)))
                      one.join(spark.read.parquet(data).select(col("fp")),
                        Seq("fp"), "left_anti")
                    else one
                  lap("write")(admitted.write.mode("append")
                    .partitionBy("lang_pred").parquet(data))
                  fs.create(marker, true).close()
                }
              } finally batch.unpersist()
            }
          }
          .start())
      val total = (System.nanoTime() - t0) / 1e9
      println(f"sink_steps $total%8.2f s  breakdown: " +
        acc.entrySet().toArray.toSeq.map(_.toString).sorted.mkString("  "))
    }

    // ---- probe growth: is the sink's per-batch admission cost flat as
    // the persisted corpus grows? Seeds a corpus in the sink's own
    // layout at 1x and 10x, then times:
    //   sink_apply_* — one all-duplicate batch through the shipped
    //     corpusBatchSink (fp side table, adaptive probe — r15): the
    //     end-to-end per-batch cost, markers/writes/listings included.
    //   probe_2s_*   — ONLY the admission join of the large-store
    //     shape (broadcast SEMI of the batch fps into the fp-store
    //     scan, broadcast ANTI of the hits back): the store is scanned
    //     pruned-to-fp, never shuffled, never broadcast.
    //   probe_r14_*  — ONLY the admission join of the r14 shape (LEFT
    //     ANTI against the fp column of the whole persisted corpus):
    //     no broadcast is possible against the growing data table, so
    //     the plan sort-merge-joins — a full shuffle+sort of every
    //     corpus fingerprint on EVERY micro-batch. That O(corpus)
    //     per-batch cost is the r14 weak mark the side table replaced;
    //     the probe_* ratio at 10x is the number the fix's claim
    //     rests on.
    {
      val pad = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 4
      def seed(dir: String, nDocs: Long, nBatches: Int): Unit = {
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        val docs = spark.range(nDocs)
          .select(col("id").as("doc_id"),
            concat(lit(pad), col("id")).as("text"))
          .withColumn("fp", md5(col("text").cast("binary")))
          .withColumn("lang_pred", lit("en"))
          .withColumn("b", pmod(col("doc_id"), lit(nBatches)))
          .persist()
        (0 until nBatches).foreach { b =>
          val part = docs.filter(col("b") === b).drop("b")
          part.write.mode("overwrite")
            .partitionBy("lang_pred").parquet(s"$dir/data/batch_id=$b")
          part.select(unhex(col("fp")).as("fpb")).coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/fp/batch_id=$b")
        }
        docs.unpersist()
        ()
      }
      val batchRows = spark.range(20000)
        .select(col("id").as("doc_id"),
          concat(lit(pad), col("id")).as("text"))
        .withColumn("fp", md5(col("text").cast("binary")))
        .withColumn("lang_pred", lit("en"))
        .localCheckpoint() // materialize: batch build cost out of the timing
      var nextId = 1000L
      for ((label, n) <- Seq(("1x", 500000L), ("10x", 5000000L))) {
        val dir = s"${sys.props("java.io.tmpdir")}/graft-cost-probe-grow-$label"
        seed(dir, n, 32)
        val sink = DocStreams.corpusBatchSink(dir)
        best(s"sink_apply_$label") {
          sink(batchRows, nextId); nextId += 1
        }
        best(s"probe_2s_$label") {
          val prior = spark.read.parquet(s"$dir/fp")
            .filter(col("batch_id") >= 0).select(col("fpb"))
          val hits = prior.join(
            broadcast(batchRows.select(unhex(col("fp")).as("fpb"))),
            Seq("fpb"), "left_semi")
          assert(batchRows.join(broadcast(hits),
              unhex(col("fp")) === col("fpb"), "left_anti")
            .count() == 0L)
        }
        best(s"probe_r14_$label") {
          assert(batchRows.join(
              spark.read.parquet(s"$dir/data").select(col("fp")),
              Seq("fp"), "left_anti")
            .count() == 0L)
        }
      }
    }
    spark.stop()
  }
}
