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

  private final case class Doc(doc_id: Long, text: String, ts: Timestamp)

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
    spark.stop()
  }
}
