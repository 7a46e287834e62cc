package graft

import org.apache.spark.sql.functions._
import graft.functions.LongArrayDot

class FunctionsSpec extends SparkSpec {

  test("graft_dot computes exact integer dot products") {
    val spark0 = spark
    import spark0.implicits._
    LongArrayDot.register(spark)
    val df = Seq((Array(1L, -2L, 3L), Array(4L, 5L, 6L)))
      .toDF("a", "b")
    val out = df.select(call_function(LongArrayDot.name, col("a"), col("b")))
      .collect().head.getLong(0)
    assert(out == 4L - 10L + 18L)
  }

  test("graft_dot throws on dimension mismatch instead of truncating") {
    val spark0 = spark
    import spark0.implicits._
    LongArrayDot.register(spark)
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val ex = intercept[Exception](
      df.select(call_function(LongArrayDot.name, col("a"), col("b"))).collect())
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: messages(t.getCause)
    assert(messages(ex).exists(m => m != null && m.contains("dimensions differ")),
      messages(ex).mkString(" | "))
  }
}
