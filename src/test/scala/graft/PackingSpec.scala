package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Mixture, Packing}

class PackingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("tokenShards assigns by exclusive prefix sum of doc_id order") {
    // token counts: 3, 4, 2, 5, 1 -> before: 0, 3, 7, 9, 14
    val d = docs(
      10L -> "a b c", 20L -> "a b c d", 30L -> "a b",
      40L -> "a b c d e", 50L -> "a")
    val out = Packing.tokenShards(d, budget = 5L, buckets = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 3, 0L), (20L, 4, 0L), (30L, 2, 1L),
      (40L, 5, 1L), (50L, 1, 2L)))
  }

  test("tokenShards is invariant to the bucket count") {
    val d = docs((0L until 200L).map(i =>
      i * 7 -> (0 to (i % 13).toInt).map(j => s"t$j").mkString(" ")): _*)
    val base = Packing.tokenShards(d, budget = 40L, buckets = 1)
      .orderBy("doc_id").collect().toSeq
    for (b <- Seq(3, 8, 64, 1000))
      assert(Packing.tokenShards(d, budget = 40L, buckets = b)
        .orderBy("doc_id").collect().toSeq == base, s"buckets=$b diverges")
  }

  test("tokenShards handles empty corpus and blank docs") {
    assert(Packing.tokenShards(docs(), budget = 10L).count() == 0)
    val out = Packing.tokenShards(
      docs(1L -> "", 2L -> "a b", 3L -> "   "), budget = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // blanks are 0 tokens and never advance the cursor
    assert(out.toSeq == Seq((1L, 0, 0L), (2L, 2, 0L), (3L, 0, 1L)))
  }

  test("deterministicShuffle is a bucket-invariant permutation") {
    val d = docs((0L until 500L).map(i => i * 3 -> s"doc $i text"): _*)
    val base = Packing.deterministicShuffle(d, seed = 42L, buckets = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a permutation of 0..n-1
    assert(base.map(_._2).sorted.toSeq == (0L until 500L).toSeq)
    // same result for every bucketing (exact global rank)
    for (b <- Seq(2, 8, 64))
      assert(Packing.deterministicShuffle(d, seed = 42L, buckets = b)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq == base.toSeq, s"buckets=$b diverges")
    // a different seed produces a different order
    val other = Packing.deterministicShuffle(d, seed = 43L, buckets = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(other.toSeq != base.toSeq)
  }

  test("keyedRank is a total dense 1..n rank, partitioning-independent") {
    val spark0 = spark
    import spark0.implicits._
    // skewed duplicate keys on purpose: 5 docs at key 7, singletons around
    val rows = Seq((1L, 7L), (2L, 7L), (3L, 2L), (4L, 7L), (5L, 9L),
      (6L, 7L), (7L, 1L), (8L, 7L))
    def ranked(parts: Int) = Packing.keyedRank(
      rows.toDF("doc_id", "k").repartition(parts), keyCol = "k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    val one = ranked(1)
    assert(one == ranked(7), "rank must not depend on partitioning")
    // reference: sort by (k, doc_id), 1-based
    val expect = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => (id, i + 1L) }.sorted
    assert(one == expect)
  }

  test("salted keyedRank/keyedQuantiles match unsalted on a giant-key corpus") {
    val spark0 = spark
    import spark0.implicits._
    // the documented skew shape: half the corpus at one key value,
    // non-contiguous doc_ids so the salt ranges cut mid-key
    val rows = (0L until 600L).map(i =>
      (i * 7 + 3, if (i % 2 == 0) 0L else 1 + i % 11))
    val df = rows.toDF("doc_id", "k").repartition(5)
    val plain = Packing.keyedRank(df, keyCol = "k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    for (s <- Seq(2, 8, 601)) {
      val salted = Packing.keyedRank(df, keyCol = "k", salt = s)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
      assert(salted == plain, s"salt=$s diverges")
    }
    val plainQ = Packing.keyedQuantiles(df, keyCol = "k", n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    val saltedQ = Packing.keyedQuantiles(df, keyCol = "k", n = 10, salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    assert(saltedQ == plainQ)
    // and the salt is real: the per-row window partitions on the salt
    // range, so the giant key's rows no longer share one task
    val plan = Packing.keyedRank(df, keyCol = "k", salt = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("salted keyedRank keeps NULL-tiebreak rows (coalesced to range 0)") {
    val spark0 = spark
    import spark0.implicits._
    // a NULL __salt would vanish in the (key, __salt) equi-join; the
    // coalesce pins null tiebreaks to range 0, where the window's
    // nulls-first ordering ranks them exactly as the unsalted form does
    val df = Seq[(java.lang.Long, Long)]((null, 0L), (10L, 0L), (20L, 0L),
      (null, 1L), (30L, 1L)).toDF("doc_id", "k")
    val plain = Packing.keyedRank(df, keyCol = "k")
      .collect().map(r => (Option(r.get(0)), r.getLong(2))).toSet
    val salted = Packing.keyedRank(df, keyCol = "k", salt = 3)
      .collect().map(r => (Option(r.get(0)), r.getLong(2))).toSet
    assert(salted.size == 5, s"null-tiebreak rows dropped: $salted")
    assert(salted == plain)
  }

  test("keyedQuantiles buckets by exact integer arithmetic") {
    val spark0 = spark
    import spark0.implicits._
    // 8 rows, n=4 -> quartiles of exactly 2 by rank order
    val rows = (1L to 8L).map(i => (i, i % 3))
    val out = Packing.keyedQuantiles(rows.toDF("doc_id", "k"),
      keyCol = "k", n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._2)
    assert(out.map(_._2).toSeq == (1L to 8L))
    assert(out.map(_._3).toSeq == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // more buckets than rows: every row its own bucket prefix, max <= n
    val tiny = Packing.keyedQuantiles(Seq((1L, 5L), (2L, 3L))
      .toDF("doc_id", "k"), keyCol = "k", n = 10).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSeq.sorted
    assert(tiny == Seq((1L, 6), (2L, 1)))
  }

  test("corpus split is consistent-hash stable: growth never moves a doc") {
    val spark0 = spark
    import spark0.implicits._
    def splits(ids: Seq[Long], parts: Int): Map[Long, String] =
      Mixture.split(ids.map(i => (i, s"t$i")).toDF("doc_id", "text")
          .repartition(parts), trainBp = 8000, valBp = 1000, seed = 7L)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = splits(1L to 200L, 3)
    val grown = splits(1L to 400L, 5)
    // membership is a pure function of (seed, doc_id): the original 200
    // keep their assignment exactly, regardless of corpus or partitioning
    assert((1L to 200L).forall(i => small(i) == grown(i)))
    // all three splits are populated at 80/10/10 over 400 docs
    val byShare = grown.values.groupBy(identity).view.mapValues(_.size)
    assert(byShare.keySet == Set("train", "val", "test"), byShare.toMap.toString)
    assert(byShare("train") > byShare("val") && byShare("train") > byShare("test"))
  }

  test("mixture resample hits integer quotas deterministically") {
    val d = docs((0L until 100L).flatMap { i =>
      val en = s"the cat and the dog of a to the house"
      val es = s"el perro y la casa de que el"
      Seq(i * 2 -> en, i * 2 + 1 -> es)
    }: _*)
    // budget 50 at 60/40: quotas 3000*50/10000=15 en, 2000*50/10000=10 es
    val out = Mixture.resample(d, Map("en" -> 3000, "es" -> 2000),
      budget = 50L, seed = 7L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 15L, "es" -> 10L))
    // deterministic under re-evaluation
    val again = Mixture.resample(d, Map("en" -> 3000, "es" -> 2000),
      budget = 50L, seed = 7L)
    assert(out.orderBy("lang", "doc_id").collect().toSeq ==
      again.orderBy("lang", "doc_id").collect().toSeq)
    // a different seed selects a different subset (w.h.p.)
    val other = Mixture.resample(d, Map("en" -> 3000, "es" -> 2000),
      budget = 50L, seed = 8L)
    assert(out.orderBy("lang", "doc_id").collect().toSeq !=
      other.orderBy("lang", "doc_id").collect().toSeq)
  }

  test("salted two-phase top-quota selects the identical subset") {
    val d = docs((0L until 300L).map { i =>
      i -> (if (i % 3 == 0) "el perro y la casa de que el"
            else "the cat and the dog of a to the house")
    }: _*)
    val targets = Map("en" -> 5000, "es" -> 5000)
    val base = Mixture.resample(d, targets, budget = 120L, seed = 3L)
      .orderBy("lang", "doc_id").collect().toSeq
    assert(base.nonEmpty)
    for (s <- Seq(2, 7, 32))
      assert(Mixture.resample(d, targets, budget = 120L, seed = 3L,
        saltBuckets = s).orderBy("lang", "doc_id").collect().toSeq == base,
        s"saltBuckets=$s diverges")
  }

  test("mixture quota caps at the language's population") {
    val d = docs(
      1L -> "the cat and the dog of a to", // en
      2L -> "el perro y la casa de que")   // es
    // en quota = min(1, 100*9000/10000=90) = 1; absent langs drop
    val out = Mixture.resample(d, Map("en" -> 9000), budget = 100L,
      seed = 1L).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("capPerSource keeps the best docs per source with a stable order") {
    val spark0 = spark
    import spark0.implicits._
    val good = "the cat and the dog of a to the house today"
    val longGood = good + " with several extra ordinary words appended here"
    val d = Seq(
      (1L, "s1", longGood), // passer, longest -> rank 1
      (2L, "s1", good),     // passer -> rank 2
      (3L, "s1", "x"),      // gate reject -> ranks below every passer
      (4L, "s1", good),     // passer, same length as 2 -> higher id loses
      (5L, "s2", "y"),      // reject but alone in its source -> still kept
    ).toDF("doc_id", "source", "text")
    val out = Mixture.capPerSource(d, cap = 2)
      .orderBy("source", "rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    assert(out.toSeq == Seq(("s1", 1L, 1L), ("s1", 2L, 2L), ("s2", 1L, 5L)))
  }

  test("epochMix expands by whole epochs plus a deterministic fraction") {
    val en = "the cat and the dog of a to the house"
    val es = "el perro y la casa de que el"
    val d = docs((0L until 200L).map(i =>
      i -> (if (i % 2 == 0) en else es)): _*)
    // en at 2.5 epochs, es absent (weight 0 -> dropped)
    val out = Mixture.epochMix(d, Map("en" -> 25000), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.forall(_._2 == "en"))
    // every en doc appears at least twice (floor 2), copies are 0..n-1
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byDoc.keySet == (0L until 200L by 2).toSet)
    assert(byDoc.values.forall(cs => cs == (0L until cs.size).toSeq))
    assert(byDoc.values.forall(cs => cs.size == 2 || cs.size == 3))
    // the fractional half lands near 50% of the 100 en docs, and the
    // total is exactly reproducible (consistent hash, fixed seed)
    val three = byDoc.values.count(_.size == 3)
    assert(three > 25 && three < 75, s"fractional selection count $three")
    val again = Mixture.epochMix(d, Map("en" -> 25000), seed = 7L).count()
    assert(again == out.length.toLong)
    // growing the corpus never changes an existing doc's copy count
    val grown = Mixture.epochMix(
      d.union(docs(1000L -> en, 1001L -> en)), Map("en" -> 25000), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .filter(_._1 < 200L).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(grown == byDoc)
  }

  test("sequencePack cuts the token stream with exact boundary metadata") {
    // token counts 3, 2, 4 at seqLen 4 -> before: 0, 3, 5; total 9
    val d = docs(1L -> "a b c", 2L -> "a b", 3L -> "a b c d")
    val out = Packing.sequencePack(d, seqLen = 4L, buckets = 2)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 0L, 0L, 3L), // doc1 fills seq0[0,3)
      (0L, 2L, 0L, 3L, 1L), // doc2 token 0 closes seq0
      (1L, 2L, 1L, 0L, 1L), // doc2 token 1 opens seq1
      (1L, 3L, 0L, 1L, 3L), // doc3 tokens 0-2 fill seq1
      (2L, 3L, 3L, 0L, 1L))) // doc3 token 3 opens the final sequence
  }

  test("sequencePack invariants: full sequences, per-doc coverage, bucket-invariance") {
    val d = docs((0L until 120L).map(i =>
      i * 3 -> (0 to (i % 17).toInt).map(j => s"t$j").mkString(" ")): _*)
    val L = 32L
    val out = Packing.sequencePack(d, seqLen = L, buckets = 1)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val total = out.map(_._5).sum
    // every sequence holds exactly L tokens except the last
    val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = bySeq.keys.max
    assert(bySeq.filterKeys(_ != lastSeq).values.forall(_ == L), s"$bySeq")
    assert(bySeq(lastSeq) == (if (total % L == 0) L else total % L))
    // every doc's slices cover [0, n_tokens) contiguously
    for ((docId, slices) <- out.groupBy(_._2)) {
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"doc $docId starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._5 == b._3,
          s"doc $docId gap between slices $a $b")
        case _ => ()
      }
      // within a sequence, seq positions line up with the slice length
      slices.foreach { sl => assert(sl._4 + sl._5 <= L) }
    }
    // bucket count never changes the result
    for (b <- Seq(2, 8, 64))
      assert(Packing.sequencePack(d, seqLen = L, buckets = b)
        .orderBy("seq_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq == out, s"buckets=$b diverges")
    // empty corpus and zero-token docs
    assert(Packing.sequencePack(docs(), seqLen = 8L).count() == 0)
    assert(Packing.sequencePack(docs(1L -> "  ", 2L -> "a b"), seqLen = 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
