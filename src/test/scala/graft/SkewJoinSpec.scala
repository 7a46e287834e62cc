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

  test("single-column large side salts without error") {
    val spark0 = spark
    import spark0.implicits._
    val large = (1 to 1000).map(_ % 5).toDF("k")
    val small = (0 until 5).map(k => (k, s"d$k")).toDF("k", "name")
    assert(SkewJoin.saltedInnerJoin(large, small, "k", buckets = 4)
      .count() == 1000)
  }
}
