package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

class WinnowSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("shared token runs share a winnowed fingerprint") {
    val common = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"alpha beta $common gamma delta",
      2L -> s"zeta eta theta $common iota")
    // k=3, w=4: any shared run of w+k-1=6 tokens guarantees a shared fp;
    // the common run has 10
    val fp = TextAnalysis.winnowedFingerprints(d, k = 3, w = 4).cache()
    val f1 = fp.filter(col("doc_id") === 1).select("fp").collect().map(_.getString(0)).toSet
    val f2 = fp.filter(col("doc_id") === 2).select("fp").collect().map(_.getString(0)).toSet
    assert((f1 & f2).nonEmpty)
    // and an unrelated doc shares nothing
    val other = TextAnalysis.winnowedFingerprints(
      docs(3L -> "completely different words entirely here and more and more"),
      k = 3, w = 4).select("fp").collect().map(_.getString(0)).toSet
    assert((f1 & other).isEmpty)
  }

  test("substringOverlapPairs self-join reuses ONE fingerprint exchange, no cache") {
    val common = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"alpha beta $common gamma delta",
      2L -> s"zeta eta theta $common iota",
      3L -> "completely different words entirely here and more and more")
    val pairs = TextAnalysis.substringOverlapPairs(d, k = 3, w = 4, minShared = 1L)
    // correctness: only the planted overlap pair survives
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // scale/hygiene: the identical join sides share one shuffle via
    // ReuseExchange (fingerprints computed once), and nothing is cached —
    // a long-lived session accumulates no blocks from repeated calls
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("InMemoryTableScan"), plan)
  }

  test("winnowing reduces fingerprint volume vs raw k-grams") {
    // all tokens distinct -> every 3-gram hash distinct, so a broken
    // no-op winnow would keep all `raw` of them and fail the bound
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> text)
    val raw = 400 - 3 + 1 // all 3-gram positions
    val kept = TextAnalysis.winnowedFingerprints(d, k = 3, w = 8).count()
    assert(kept < raw / 2, s"kept $kept of $raw")
    assert(kept > 0)
  }
}
