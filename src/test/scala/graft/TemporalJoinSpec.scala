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
