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

  test("substringSpans drops the shared run from the higher doc only") {
    val common = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"alpha beta $common gamma delta",
      2L -> s"zeta eta theta $common iota",
      3L -> "completely different words entirely here and more and more")
    val spans = TextAnalysis.substringSpans(d, k = 3, w = 4, minShared = 1L)
      .orderBy("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // keep-first: doc 1 keeps everything; doc 2's copy of the common run
    // sits at token offsets 3..12 — exactly the exact-gram-covered region
    // (winnow only nominates the pair; spans come from exact shared
    // 3-grams, all of which lie inside the common run)
    assert(spans.toSeq == Seq((2L, 3, 12, 10)))
  }

  test("keep-longest reorients spans toward the shorter pair member") {
    val common = "one two three four five six seven eight nine ten"
    // doc 1 is SHORTER but lower-id; doc 2 is the longer original.
    // keep-first drops the run from doc 2; keep-longest drops it from
    // doc 1 instead (the policy difference in one pair).
    val d = docs(
      1L -> s"alpha $common",
      2L -> s"zeta eta theta $common iota kappa lambda mu")
    def spansOf(longest: Boolean) =
      TextAnalysis.substringSpans(d, k = 3, w = 4, minShared = 1L,
        keepLongest = longest)
        .orderBy("doc_id", "start_tok").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(spansOf(false) == Seq((2L, 3, 12, 10)))
    assert(spansOf(true) == Seq((1L, 1, 10, 10)))
    // equal lengths tie-break to the lower id: behaves like keep-first
    val tied = docs(
      5L -> s"alpha beta $common",
      6L -> s"gamma delta $common")
    val tiedSpans = TextAnalysis.substringSpans(tied, k = 3, w = 4,
      minShared = 1L, keepLongest = true).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(tiedSpans == Seq((6L, 2, 11, 10)))
  }

  test("substringSpans merges overlapping coverage and splits on gaps") {
    val runA = "one two three four five six"     // 6 tokens
    val runB = "ten twenty thirty forty fifty sixty" // 6 tokens
    val d = docs(
      1L -> s"$runA filler0 filler1 $runB",
      // doc 2 carries run A at offsets 0..5 and run B at offsets 8..13,
      // with a 2-token gap -> two separate spans (gap > 0 tokens)
      2L -> s"$runA gapx gapy $runB")
    val spans = TextAnalysis.substringSpans(d, k = 3, w = 2, minShared = 1L)
      .orderBy("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.forall(_._1 == 2L), spans.toSeq.toString)
    assert(spans.toSeq == Seq((2L, 0, 5, 6), (2L, 8, 13, 6)))
  }

  test("substringSpansApply rebuilds losers and passes winners through") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val common = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"alpha beta $common gamma delta",
      2L -> s"zeta eta theta  $common iota", // doubled space: normalized away
      3L -> "completely different words entirely here and more and more")
    val out = TextAnalysis.substringSpansApply(d, k = 3, w = 4, minShared = 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 2 drops the common run (offsets 3..12); docs 1 and 3 untouched
    assert(out.toSeq == Seq(
      (1L, 14, md5hex(s"alpha beta $common gamma delta")),
      (2L, 4, md5hex("zeta eta theta iota")),
      (3L, 9, md5hex("completely different words entirely here and more and more"))))
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
