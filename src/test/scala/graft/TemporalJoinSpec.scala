package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import scala.util.Random

  test("asOf picks the most recent right row at or before each left ts") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, 4L, "l0"), (1L, 5L, "l1"), (1L, 7L, "l2"),
      (1L, 10L, "l3"), (1L, 12L, "l4"), (2L, 100L, "l5"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 50L), (1L, 10L, 100L), (3L, 1L, 999L))
      .toDF("k", "t", "v")
    val out = TemporalJoin.asOf(left, right, key = "k", ts = "t",
        payload = Seq("t", "v"))
      .select(col("tag"), col("asof.t").as("at"), col("asof.v").as("av"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // inclusive bound: the left at t=5 sees the right at t=5; key 2 has
    // no rights at all; key 3's right never leaks across keys
    assert(out == Set(("l0", -1L, -1L), ("l1", 5L, 50L), ("l2", 5L, 50L),
      ("l3", 10L, 100L), ("l4", 10L, 100L), ("l5", -1L, -1L)))
  }

  test("asOf matches a brute-force model on random data and plans without a join") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(42)
    val lefts = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rights = (1 to 200).map { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq // unique (k,t)
    val ldf = lefts.toDF("k", "t", "lid").repartition(7)
    val rdf = rights.toDF("k", "t", "v").repartition(3)
    val out = TemporalJoin.asOf(ldf, rdf, "k", "t", Seq("v"))
      .select(col("lid"), coalesce(col("asof.v"), lit(-1L)).as("v"))
    val expected = lefts.map { case (k, t, lid) =>
      val cand = rights.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cand.isEmpty) -1L else cand.maxBy(_._2)._3)
    }.toMap
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == expected)
    // single-shuffle shape: a window pass, never a join operator
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("range join matches brute force and never plans a nested loop") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(7)
    val ivs = (1 to 150).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(300))
    }
    val pts = (1 to 500).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong, i.toLong))
    val out = TemporalJoin.range(
      ivs.toDF("iid", "k", "lo", "hi").repartition(5),
      pts.toDF("k", "t", "pid").repartition(3),
      key = "k", lo = "lo", hi = "hi", t = "t", bucketMs = 100L)
    val got = out.select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (iid, ik, lo, hi) <- ivs
      (pk, t, pid) <- pts
      if pk == ik && t >= lo && t <= hi
    } yield (iid, pid)).toSet
    assert(got == expected)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("asOf on TimestampType keeps sub-second precision (no whole-second ties)") {
    val spark0 = spark
    import spark0.implicits._
    // left at 10.2s; rights at 9.8s and 10.5s IN THE SAME WHOLE SECOND as
    // the left. A regression to cast("long") truncates all three to 9/10s,
    // where the 10.5s right ties with the left (right sorts first) and
    // wrongly attaches a FUTURE row. epochLong's unix_millis keeps order.
    val left = Seq((1L, 10200L, "l0")).toDF("k", "ms", "tag")
      .select(col("k"), timestamp_millis(col("ms")).as("t"), col("tag"))
    val right = Seq((1L, 9800L, 1L), (1L, 10500L, 2L)).toDF("k", "ms", "v")
      .select(col("k"), timestamp_millis(col("ms")).as("t"), col("v"))
    val out = TemporalJoin.asOf(left, right, "k", "t", Seq("v"))
      .select(col("asof.v")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("range join stays exact past 2^53: nanos straddling bucket boundaries") {
    val spark0 = spark
    import spark0.implicits._
    val width = 1000000000L // 1s buckets in nanosecond units
    val base = 1152921505000000000L // exact multiple of width, ~2^60
    // intervals hugging each boundary; points at +-2ns around them — every
    // true pair must survive the bucket equi-join (double floor rounds
    // these 60-bit values and can misbucket either side)
    val ivs = (-3 to 3).map(d =>
      (d.toLong + 10L, 1L, base + d * width - 5L, base + d * width + 5L))
    val pts = for {
      d <- -3 to 3; e <- Seq(-2L, -1L, 0L, 1L, 2L)
    } yield (1L, base + d * width + e, d.toLong * 10 + e)
    val out = TemporalJoin.range(
      ivs.toDF("iid", "k", "lo", "hi"), pts.toDF("k", "t", "pid"),
      "k", "lo", "hi", "t", bucketMs = width)
    val got = out.select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (iid, _, lo, hi) <- ivs
      (_, t, pid) <- pts
      if t >= lo && t <= hi
    } yield (iid, pid)).toSet
    assert(expected.size == 7 * 5) // every point is inside its interval
    assert(got == expected)
  }

  test("range join pairs TimestampType intervals with epoch-ms long points") {
    val spark0 = spark
    import spark0.implicits._
    // mixed units: intervals carry real timestamps, points raw epoch-ms
    // longs. Buckets AND the residual filter must both compare in the
    // normalized ms domain — a raw long-vs-timestamp residual would have
    // Spark treat the longs as SECONDS and drop every true pair.
    val ivs = Seq((1L, 1L, 5000L, 7500L), (2L, 1L, 8200L, 8400L),
      (3L, 2L, 1000L, 9000L))
    val pts = Seq((1L, 5000L, 1L), (1L, 7500L, 2L), (1L, 7501L, 3L),
      (1L, 8300L, 4L), (2L, 4000L, 5L), (2L, 9001L, 6L))
    val out = TemporalJoin.range(
      ivs.toDF("iid", "k", "loMs", "hiMs")
        .select(col("iid"), col("k"), timestamp_millis(col("loMs")).as("lo"),
          timestamp_millis(col("hiMs")).as("hi")),
      pts.toDF("k", "t", "pid"),
      "k", "lo", "hi", "t", bucketMs = 1000L)
    val got = out.select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (iid, ik, lo, hi) <- ivs
      (pk, t, pid) <- pts
      if pk == ik && t >= lo && t <= hi
    } yield (iid, pid)).toSet
    assert(got == expected)
    assert(expected == Set((1L, 1L), (1L, 2L), (2L, 4L), (3L, 5L)))
  }

  test("asOfSharded carries right state across shard boundaries") {
    val spark0 = spark
    import spark0.implicits._
    // shardWidth 10. Key 1's rights: t=5 (shard 0), t=23 (shard 2),
    // t=30 (exactly a shard start, shard 3). Lefts probe: in-shard match,
    // carry over an EMPTY shard (t=20 must see t=5's value, not t=23's),
    // boundary tie (t=30 must prefer the real right at 30 over the
    // carry), and pure-carry shards far downstream.
    val right = Seq((1L, 5L, 50L), (1L, 23L, 230L), (1L, 30L, 300L))
      .toDF("k", "t", "v")
    val left = Seq((1L, 3L, "a"), (1L, 5L, "b"), (1L, 20L, "c"),
      (1L, 25L, "d"), (1L, 30L, "e"), (1L, 31L, "f"), (1L, 47L, "g"),
      (2L, 8L, "h")).toDF("k", "t", "tag")
    val out = TemporalJoin.asOfSharded(left, right, "k", "t", Seq("v"),
        shardWidth = 10L)
      .select(col("tag"), coalesce(col("asof.v"), lit(-1L)).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> -1L, "b" -> 50L, "c" -> 50L, "d" -> 230L,
      "e" -> 300L, "f" -> 300L, "g" -> 300L, "h" -> -1L))
  }

  test("asOfSharded matches asOf on a 90%-hot-key distribution, no join planned") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(11)
    def key(): Long = if (rnd.nextInt(10) > 0) 7L else rnd.nextInt(3).toLong
    val lefts = (1 to 500).map(i => (key(), rnd.nextInt(10000).toLong, i.toLong))
    val rights = (1 to 300).map { i =>
      (key(), rnd.nextInt(10000).toLong, i.toLong)
    }.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq // unique (k,t)
    val ldf = lefts.toDF("k", "t", "lid").repartition(7)
    val rdf = rights.toDF("k", "t", "v").repartition(3)
    val out = TemporalJoin.asOfSharded(ldf, rdf, "k", "t", Seq("v"),
        shardWidth = 500L)
      .select(col("lid"), coalesce(col("asof.v"), lit(-1L)).as("v"))
    val expected = lefts.map { case (k, t, lid) =>
      val cand = rights.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cand.isEmpty) -1L else cand.maxBy(_._2)._3)
    }.toMap
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == expected)
    // still single-shuffle-per-stage: windows and aggregates, never a join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("range join rejects a non-positive bucket width") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 1L, 2L)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      TemporalJoin.range(df, df.select(col("iid").as("k2"), col("lo").as("t")),
        "iid", "lo", "hi", "t", bucketMs = 0L)
    }
  }
}
