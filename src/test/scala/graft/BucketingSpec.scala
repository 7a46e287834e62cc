package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables: both sides pre-hash-partitioned
  * into the same bucket count on the join key join with NO exchange on
  * either side — the write-once/join-many pattern for repeated big-big
  * joins at cluster scale (a shuffle per join becomes a shuffle per
  * table LIFETIME).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without any shuffle exchange") {
    val spark0 = spark
    import spark0.implicits._
    val wh = tmpDir("bucketing")
    spark.sql("DROP TABLE IF EXISTS graft_bl")
    spark.sql("DROP TABLE IF EXISTS graft_br")
    (1 to 20000).map(i => (i % 97, i)).toDF("k", "a")
      .write.option("path", s"$wh/bl").bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("graft_bl")
    (1 to 5000).map(i => (i % 97, s"v$i")).toDF("k", "b")
      .write.option("path", s"$wh/br").bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("graft_br")
    val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
    // correct result...
    val lc = (1 to 20000).groupBy(_ % 97).view.mapValues(_.size)
    val rc = (1 to 5000).groupBy(_ % 97).view.mapValues(_.size)
    val expected = lc.map { case (k, n) => n.toLong * rc.getOrElse(k, 0) }.sum
    assert(joined.count() == expected)
    // ...and a plan with zero shuffle exchanges on the join
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }
}
