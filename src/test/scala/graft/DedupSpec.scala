package graft

import graft.pipeline.Dedup

/** Unit coverage for the dedup family's scale guard: the optional
  * document-frequency cap on the exact n-gram Jaccard join. (The family's
  * end-to-end correctness is oracle-checked by the driver via
  * SparkEntry.queries; this spec pins the capped-vs-uncapped semantics.)
  */
class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ngram Jaccard DF cap drops only stop-shingle pairs") {
    import spark.implicits._
    // docs 1,2: genuine duplicates (unique shingles, df=2).
    // docs 3..10: share ONE stop shingle ("common stop phrase", df=8) and
    // are otherwise distinct — each has 2 trigram shingles, so any two of
    // them meet J = 1/(2+2-1) = 1/3 through the stop shingle alone.
    val docs = (Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")) ++
      (3L to 10L).map(i => (i, s"common stop phrase uniq$i")))
      .toDF("doc_id", "text")

    val uncapped = pairs(Dedup.ngramJaccardPairs(docs, n = 3, tnum = 1, tden = 3))
    val capped = pairs(Dedup.ngramJaccardPairs(docs, n = 3, tnum = 1, tden = 3,
      maxDocFreq = Some(3)))

    val stopOnly = (for { a <- 3L to 10L; b <- (a + 1) to 10L } yield (a, b)).toSet
    assert(uncapped == stopOnly + ((1L, 2L)))
    // cap filters the df=8 shingle out of join AND sizes: the stop-only
    // pairs vanish, the genuine duplicate pair is untouched
    assert(capped == Set((1L, 2L)))
  }

  test("ngram Jaccard DF cap rejects degenerate caps") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairs(docs, 2, 1, 2, maxDocFreq = Some(1)))
  }
}
