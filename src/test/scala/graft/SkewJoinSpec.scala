package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join multiset equals plain join under heavy skew") {
    val spark0 = spark
    import spark0.implicits._
    // 10k rows, 90% on one hot key
    val rnd = new scala.util.Random(3)
    val large = (1 to 10000)
      .map(i => (if (rnd.nextInt(10) < 9) 7 else rnd.nextInt(50), i))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, "k")
      .select("k", "payload", "name").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", buckets = 8)
      .select("k", "payload", "name").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("identical hot-key rows still spread and join exactly") {
    val spark0 = spark
    import spark0.implicits._
    // the degenerate hot key: 5000 IDENTICAL rows (same key, same payload)
    val large = Seq.fill(5000)((7, "dup")).toDF("k", "payload")
    val small = Seq((7, "dim7"), (8, "dim8")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(large, small, "k", buckets = 8)
    assert(out.count() == 5000)
  }

  test("engine join keywords honor the session salt knob") {
    val spark0 = spark
    import spark0.implicits._
    import graft.lang.Op.HashJoin
    import graft.operators.ColumnOps
    // values intermediates as the engine shapes them: (alignCol, id, v)
    val l = (0L until 2000L).map(i => (i, i, (i % 7).toInt)).toDF("a", "id", "v")
    val r = (0L until 300L).map(i => (i, i, (i % 7).toInt)).toDF("a", "id", "v")
    def pairs(): Seq[(Long, Long)] = {
      val (p, _) = ColumnOps.join(HashJoin, l, r, Seq("a"), Seq("a"))
      p.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSeq.sorted
    }
    val unsalted = pairs()
    spark.conf.set(SkewJoin.BucketsKey, "8")
    try {
      val (p, _) = ColumnOps.join(HashJoin, l, r, Seq("a"), Seq("a"))
      // the salted shape is in the plan: join key extended with _salt,
      // small side exploded over the bucket range
      val plan = p.queryExecution.optimizedPlan.toString
      assert(plan.contains("_salt"), plan.take(2000))
      val salted = p.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      assert(salted == unsalted)
    } finally spark.conf.unset(SkewJoin.BucketsKey)
  }

  test("auto mode salts a hot-key corpus exactly like the manual knob") {
    val spark0 = spark
    import spark0.implicits._
    import graft.lang.Op.HashJoin
    import graft.operators.ColumnOps
    // 20k rows, half on one hot value: the sampled share (~0.5) clears
    // the 0.1 hot threshold with huge margin at a 1% sample
    val l = (0L until 20000L)
      .map(i => (i, i, if (i % 2 == 0) 7 else (i % 97).toInt))
      .toDF("a", "id", "v")
    val r = (0L until 300L).map(i => (i, i, (i % 97).toInt)).toDF("a", "id", "v")
    assert(SkewJoin.detectHotKey(l, "v"), "hot key not detected")
    assert(SkewJoin.resolveBuckets(l, "v") == 0, "salt without knob")
    def run(): (String, Seq[(Long, Long)]) = {
      val (p, _) = ColumnOps.join(HashJoin, l, r, Seq("a"), Seq("a"))
      (p.queryExecution.optimizedPlan.toString,
        p.select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted)
    }
    spark.conf.set(SkewJoin.BucketsKey, "8")
    val (manualPlan, manualPairs) = try run()
      finally spark.conf.unset(SkewJoin.BucketsKey)
    spark.conf.set(SkewJoin.BucketsKey, "auto")
    val (autoPlan, autoPairs) = try {
      assert(SkewJoin.resolveBuckets(l, "v") == 8)
      run()
    } finally spark.conf.unset(SkewJoin.BucketsKey)
    assert(manualPlan.contains("_salt") && autoPlan.contains("_salt"))
    assert(autoPairs == manualPairs)
  }

  test("auto mode leaves uniform keys unsalted") {
    val spark0 = spark
    import spark0.implicits._
    import graft.lang.Op.HashJoin
    import graft.operators.ColumnOps
    val l = (0L until 20000L).map(i => (i, i, (i % 97).toInt))
      .toDF("a", "id", "v")
    val r = (0L until 300L).map(i => (i, i, (i % 97).toInt)).toDF("a", "id", "v")
    assert(!SkewJoin.detectHotKey(l, "v"), "uniform keys read as hot")
    spark.conf.set(SkewJoin.BucketsKey, "auto")
    try {
      assert(SkewJoin.resolveBuckets(l, "v") == 0)
      val (p, _) = ColumnOps.join(HashJoin, l, r, Seq("a"), Seq("a"))
      val plan = p.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_salt"),
        "uniform corpus paid small-side replication: " + plan.take(1000))
    } finally spark.conf.unset(SkewJoin.BucketsKey)
  }

  test("single-column large side salts without error") {
    val spark0 = spark
    import spark0.implicits._
    val large = (1 to 1000).map(_ % 5).toDF("k")
    val small = (0 until 5).map(k => (k, s"d$k")).toDF("k", "name")
    assert(SkewJoin.saltedInnerJoin(large, small, "k", buckets = 4)
      .count() == 1000)
  }
}
