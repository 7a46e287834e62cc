package graft

import org.apache.spark.sql.functions.col
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

  test("incremental dedup keeps first-in-batch texts unseen in the store") {
    import spark.implicits._
    val store = Seq(
      (10L, "already ingested"),
      (11L, "also known")).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "already ingested"),   // store hit -> dropped
      (21L, "fresh one"),          // survives
      (22L, "fresh two"),          // survives (first occurrence)
      (23L, "fresh two"),          // batch-internal dup -> dropped
      (24L, "also known"),         // store hit -> dropped
      (25L, "fresh one")           // batch-internal dup of 21 -> dropped
    ).toDF("doc_id", "text")
    val surv = Dedup.incremental(store, batch).collect()
      .map(r => r.getLong(0)).toSet
    assert(surv == Set(21L, 22L))
    // empty batch -> empty result; empty store -> plain batch dedup
    assert(Dedup.incremental(store, batch.limit(0)).count() == 0)
    val noStore = Dedup.incremental(store.limit(0), batch).collect()
      .map(_.getLong(0)).toSet
    assert(noStore == Set(20L, 21L, 22L, 24L))
  }

  test("incrementalNear drops store near-dups and in-batch near-dups") {
    import spark.implicits._
    val store = Seq(
      (10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of store doc 10 (4 of 5 shared trigram shingles after
      // one-token change -> J = 2/4 >= 1/2): dropped by the near stage
      (21L, "alpha beta gamma delta zeta"),
      // survives: unrelated
      (22L, "one two three four five"),
      // near-dup of 22 within the batch -> higher id dropped
      (23L, "one two three four six"),
      // exact dup of 22 -> dropped by the exact stage
      (24L, "one two three four five")
    ).toDF("doc_id", "text")
    val surv = Dedup.incrementalNear(store, batch, n = 3, tnum = 1, tden = 2)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(22L))
    // with an empty store it reduces to batch exact dedup + pair pruning
    val noStore = Dedup.incrementalNear(store.limit(0), batch,
      n = 3, tnum = 1, tden = 2).collect().map(_.getLong(0)).toSet
    assert(noStore == Set(21L, 22L))
  }

  test("incrementalNearPersisted probes prebuilt store tables, same result") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(): String = (0 until 8).map(_ => words(rnd.nextInt(10))).mkString(" ")
    val storeTexts = (0 until 40).map(i => (i.toLong, doc()))
    val batchTexts = (0 until 40).map { i =>
      val id = 1000L + i
      i % 4 match {
        case 0 => (id, storeTexts(i)._2)            // exact store dup
        case 1 => (id, storeTexts(i)._2 + " kappa") // near store dup
        case _ => (id, doc())                        // fresh (may self-near-dup)
      }
    }
    val store = storeTexts.toDF("doc_id", "text")
    val batch = batchTexts.toDF("doc_id", "text")
    val inline = Dedup.incrementalNear(store, batch, n = 3,
      tnum = 1, tden = 2).collect().map(_.getLong(0)).toSet
    // build the persisted tables once, round-trip them through parquet
    // (what a real store layout does), and probe WITHOUT the store df
    val dir = tmpDir("dedup-store")
    Dedup.exactKeys(store).write.parquet(s"$dir/keys")
    Dedup.shingles(store, 3).write.parquet(s"$dir/shingles")
    val persisted = Dedup.incrementalNearPersisted(
      spark.read.parquet(s"$dir/keys"),
      spark.read.parquet(s"$dir/shingles"),
      batch, n = 3, tnum = 1, tden = 2)
    assert(persisted.collect().map(_.getLong(0)).toSet == inline)
    // the probe genuinely reads the persisted layouts (and by
    // construction never sees the store corpus: it isn't an input)
    val scans = persisted.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }
    assert(scans.exists(_.contains(s"$dir/keys")) &&
      scans.exists(_.contains(s"$dir/shingles")), scans.mkString("; "))
  }

  test("hash-keyed exact dedup equals by-text exact dedup") {
    import spark.implicits._
    // duplicates, a near-miss (one char off), and empty/whitespace texts
    val docs = Seq(
      (1L, "same text body"), (5L, "same text body"), (3L, "same text body"),
      (2L, "same text bodY"), (4L, ""), (6L, ""), (7L, " "),
      (8L, "unique document")).toDF("doc_id", "text")
    def groups(byHash: Boolean): Set[(Long, Long)] =
      Dedup.exact(docs, byHash).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 3L), (2L, 1L), (4L, 2L), (7L, 1L), (8L, 1L))
    assert(groups(byHash = false) == expected)
    assert(groups(byHash = true) == expected)
  }

  test("contamination flags train docs overlapping the eval split") {
    import spark.implicits._
    // eval doc 1; train doc 10 leaks a 4-trigram run of it, train doc 11
    // shares only 1 trigram, train doc 12 shares nothing
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (10L, "noise alpha beta gamma delta epsilon tail"),
      (11L, "alpha beta gamma unrelated words here"),
      (12L, "completely different text body now")).toDF("doc_id", "text")
    val out = Dedup.contamination(docs, col("doc_id") < 10, n = 3,
      minShared = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10 shares trigrams: "alpha beta gamma","beta gamma delta",
    // "gamma delta epsilon" -> 3; doc 11 shares 1 (below threshold)
    assert(out == Set((10L, 1L, 3L)))
  }

  test("ngram Jaccard DF cap rejects degenerate caps") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairs(docs, 2, 1, 2, maxDocFreq = Some(1)))
  }
}
