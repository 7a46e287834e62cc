package graft

import org.apache.spark.sql.SparkSession

/** Pins the bench harness's failure-honest contract: a crashing query
  * must surface in `failed`/`errors`, NEVER as a fast-looking min, and
  * an intermittently-crashing query must be visible as `flaky` with its
  * per-rep success count — not hide behind a legitimate-looking min.
  */
class BenchSpec extends SparkSpec {

  test("a query failing every rep publishes no min and counts as failed") {
    val good = (s: SparkSession, _: String) => s.range(10).toDF("id")
    val bad: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("boom")
    val results = Bench.measure(spark,
      Seq("zgood" -> good, "abad" -> bad), "unused", reps = 2)
    val line = Bench.render(results, reps = 2, sfDir = "unused")
    // the artifact is one valid JSON object (the driver's parse contract)
    val spark0 = spark
    import spark0.implicits._
    val parsed = spark.read.json(Seq(line).toDS).collect()(0)
    assert(parsed.getAs[Long]("failed") == 1L)
    assert(parsed.getAs[Long]("flaky") == 0L)
    assert(line.contains(""""abad":"RuntimeException: boom""""))
    assert(line.contains(""""reps_ok":{"abad":0,"zgood":2}"""))
    // the judged min map (last on the line) carries only the good query
    val minMap = line.substring(line.lastIndexOf("\"queries\":"))
    assert(!minMap.contains("abad"), minMap)
    assert(minMap.contains("zgood"), minMap)
    // and the failed query contributes nothing to the headline total
    val soloTotal = Bench.render(
      results.filter(_.name == "zgood"), 2, "unused")
    assert(parsed.getAs[Double]("value") ==
      spark.read.json(Seq(soloTotal).toDS).collect()(0).getAs[Double]("value"))
  }

  test("a query crashing on some reps surfaces as flaky with its ok-rep count") {
    var calls = 0
    val flaky = (s: SparkSession, _: String) => {
      calls += 1
      if (calls == 1) throw new IllegalStateException("first rep dies")
      s.range(5).toDF("id")
    }
    val line = Bench.render(
      Bench.measure(spark, Seq("q" -> flaky), "unused", reps = 3),
      reps = 3, sfDir = "unused")
    assert(line.contains(""""failed":0"""))
    assert(line.contains(""""flaky":1"""))
    assert(line.contains(""""reps_ok":{"q":2}"""))
    assert(line.contains("IllegalStateException"))
    // the flaky query's min comes from its 2 successful reps
    assert(line.substring(line.lastIndexOf("\"queries\":")).contains("\"q\":"))
  }

  test("reps are interleaved rep-major so a load spike cannot own one query's whole sample") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def rec(name: String) = (s: SparkSession, _: String) => {
      order += name; s.range(1).toDF("id")
    }
    val results = Bench.measure(spark,
      Seq("b" -> rec("b"), "a" -> rec("a"), "c" -> rec("c")),
      "unused", reps = 3)
    // rep-major: full sorted pass, then the next pass — NOT a,a,a,b,b,b
    assert(order.toSeq == Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"),
      order.mkString(","))
    // every query still gets all its reps and a min
    assert(results.forall(_.okReps == 3))
  }

  test("worst-min re-measure adds a sample to exactly the slowest queries") {
    val good = (s: SparkSession, _: String) => s.range(3).toDF("id")
    val selected = Seq("slow" -> good, "fast" -> good, "mid" -> good)
    val measured = Seq(
      Bench.QueryResult("slow", Seq(9.0, 9.5), None, 2),
      Bench.QueryResult("fast", Seq(0.1, 0.2), None, 2),
      Bench.QueryResult("mid", Seq(1.0, 1.1), None, 2))
    val defended = Bench.remeasureWorst(spark, selected, measured,
      "unused", n = 2)
    val byName = defended.map(r => r.name -> r).toMap
    // the two largest mins got one extra (real) sample; the fast one not
    assert(byName("slow").okReps == 3 && byName("mid").okReps == 3)
    assert(byName("fast").okReps == 2)
    // extra samples can only keep or lower the min
    assert(byName("slow").okTimes.min <= 9.0)
  }

  test("a failed bonus run is dropped, never marking a green query flaky") {
    val bad: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (_, _) => throw new RuntimeException("spike hit the defense pass")
    val measured = Seq(Bench.QueryResult("q", Seq(5.0, 5.1), None, 2))
    val defended = Bench.remeasureWorst(spark, Seq("q" -> bad), measured,
      "unused", n = 1)
    assert(defended == measured) // untouched: no sample, no error carried
    val line = Bench.render(defended, 2, "unused")
    assert(line.contains("\"flaky\":0") && line.contains("\"failed\":0"))
  }
}
