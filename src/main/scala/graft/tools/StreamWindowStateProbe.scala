package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, Replay}

/** Measure the windowed streaming aggregation
  * ([[EventStreams.windowedStats]] — the `stream_window` bench entry)
  * against GROWING state-store cardinality, under the default
  * HDFS-backed state store provider vs RocksDB — the measurement that
  * decides whether the RocksDB provider should be the recommended conf
  * for windowed aggs at scale (the r14 probe answered this for the
  * DEDUP state shape only; windowed-agg state is per (user, window)
  * key with a multi-column aggregate row, a different residency
  * profile).
  *
  * State cardinality is driven directly: `users × hours` open windows
  * per scale step (events land 2 per window, so row volume grows with
  * state, as in any real feed). The feed replays as 4 micro-batches +
  * a sentinel batch that closes every window (append-mode emission
  * drains the full state exactly once — the eviction cost is measured,
  * not deferred).
  *
  * Usage: `sbt "runMain graft.tools.StreamWindowStateProbe
  *   [keys1,keys2,...] [reps]"`
  * Defaults: 100000,1000000,2000000 state keys (1x/10x/20x), 2 reps.
  * Provider order alternates per rep (order-bias control).
  */
object StreamWindowStateProbe {
  // the PUBLIC streaming event type: codegen needs accessible accessors
  // (a private nested case class fails Janino compilation)
  import EventStreams.Event

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("100000,1000000,2000000")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .appName("graft-stream-window-state-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // production-representative STATE partitioning: Replay pins the
    // shuffle-partition count to 2 (its replay-overhead optimum), but
    // this probe exists to characterize the state store itself — both
    // providers' residency/overhead profiles scale with partition
    // count, so it measures at the session's 32 (executor-count
    // sizing), overridable for sensitivity runs
    spark.conf.set("graft.replay.shufflePartitions",
      sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "32"))

    val rKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hours = 5
    val t0 = 1704067200000L // 2024-01-01T00:00Z

    for (keys <- sizes) {
      val users = math.max(1, keys / hours)
      // 2 events per (user, window) key; a deterministic LCG supplies
      // the value column so nothing here depends on wall-clock or RNG
      // TIME-sorted feed: the watermark advances monotonically across
      // micro-batches, so no event is ever late-dropped and every
      // window closes (batch boundaries then cut in event time, the
      // shape of a healthy production feed)
      val rows: Seq[Event] = (0 until users).flatMap { u =>
        (0 until hours).flatMap { h =>
          (0 until 2).map { k =>
            val ts = new Timestamp(t0 + h * 3600000L + k * 60000L + u % 50)
            Event(u.toLong, (u * 10 + h * 2 + k).toLong,
              s"t${(u + h + k) % 7}", ts,
              ((u * 1103515245L + h * 12345L + k) % 1000).toDouble / 10.0)
          }
        }
      }.sortBy(_.ts.getTime)
      val horizon = t0 + (hours + 100) * 3600000L
      val batches = Replay.chunks(rows, 4) ++ Seq(Seq(
        Event(-1L, -1L, "sentinel", new Timestamp(horizon), 0.0)))

      def run(): Long = {
        val out = Replay.replay(spark, batches)(in =>
          EventStreams.windowedStats(in, windowDur = "1 hour",
            lateness = "30 minutes"))
        val n = out.count()
        // free each run's memory sink: the replay table pins
        // users x hours result rows in the driver, and 8+ runs of up
        // to 2M rows would otherwise accumulate into the very heap
        // pressure this probe is trying to attribute to state stores
        import scala.jdk.CollectionConverters._
        spark.catalog.listTables().collectAsList().asScala
          .filter(_.name.startsWith("replay_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        n
      }
      def timeIt(body: => Unit): Double = {
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }

      // per-provider counts, validated SEPARATELY — a wrong closed-
      // window count from one provider must never be masked by
      // whichever provider happened to run last
      var tHdfs = Double.MaxValue; var tRocks = Double.MaxValue
      var nHdfs = -1L; var nRocks = -1L
      for (r <- 1 to reps) {
        val order = if (r % 2 == 1) Seq("hdfs", "rocks") else Seq("rocks", "hdfs")
        order.foreach {
          case "hdfs" =>
            val t = timeIt { nHdfs = run() }
            tHdfs = math.min(tHdfs, t)
          case "rocks" =>
            spark.conf.set(rKey, rocks)
            try {
              val t = timeIt { nRocks = run() }
              tRocks = math.min(tRocks, t)
            } finally spark.conf.unset(rKey)
        }
      }
      val expect = users.toLong * hours
      println(f"state_keys=$keys%-9d (users=$users x $hours windows, " +
        f"${rows.size} rows)  closed=$nHdfs/$nRocks (expect $expect)  " +
        f"hdfs $tHdfs%7.2f s   rocksdb $tRocks%7.2f s")
      require(nHdfs == expect, s"hdfs windows out: $nHdfs != $expect")
      require(nRocks == expect, s"rocksdb windows out: $nRocks != $expect")
    }
    spark.stop()
  }
}
