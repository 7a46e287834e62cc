package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign every document, in deterministic
  * doc_id order, to the training shard where its first token falls when
  * documents are laid out back-to-back and cut every `budget` tokens —
  * the shard-assignment step of a sequence-packing pipeline (each shard
  * then packs to fixed-length rows locally).
  *
  * The core is a distributed exclusive prefix-sum over doc_id order —
  * the classic two-phase scan:
  *   phase 1: order-preserving range buckets (pure arithmetic on doc_id,
  *            no sampling, so bucket ids are stable across jobs), one
  *            group-by for per-bucket token totals; the ≤`buckets` totals
  *            cross to the driver (KB-scale) and become exclusive
  *            running offsets;
  *   phase 2: per-bucket window cumsum + broadcast offset join.
  * No single-partition window ever sees the whole corpus — the widest
  * shuffle is `buckets`-way, and at 100 TB `buckets` scales to executor
  * count (still a KB-scale driver crossing).
  *
  * Costs two corpus scans (totals pass + cumsum pass) — the standard
  * scan-twice trade of a distributed prefix sum; the scanned projection
  * is (doc_id, n_tokens), never the text twice... the token count IS
  * recomputed per scan, which beats materializing a corpus-sized
  * intermediate at scale.
  *
  * Output: `(doc_id, n_tokens, shard)` — shard ids are dense from 0,
  * `shard = floor(tokens_before_doc / budget)`. Integer-exact (`div`),
  * so a SQL oracle replays it with one window sum.
  */
object Packing {

  /** Deterministic corpus shuffle: a pseudorandom permutation
    * `(doc_id, pos)` with `pos` = rank of the md5-derived 60-bit
    * priority (ties by doc_id) — the shuffle-before-sharding step of a
    * training pipeline, stable across runs/engines/partitionings
    * because membership is a pure function of (seed, doc_id), the same
    * consistent-priority contract as [[Mixture]] and
    * [[graft.functions.ReservoirSample]].
    *
    * Scale shape: the global rank is a two-phase scan like
    * [[tokenShards]], but bucketed on the PRIORITY space, which is
    * uniform by construction — `bucket = pri div ceil(2^60/buckets)` is
    * pure arithmetic (order-preserving, no sampling, stable across
    * jobs), so per-bucket ranks plus exclusive bucket-count offsets
    * compose to the exact global rank. Driver crossing is <= `buckets`
    * count rows; no single-partition sort anywhere.
    */
  def deterministicShuffle(docs: DataFrame, seed: Long,
                           buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = docs.select(col("doc_id").cast("long").as("doc_id"),
      conv(substring(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long").as("pri"))
    val width = ((1L << 60) + buckets - 1) / buckets // ceil: max id < buckets
    val withB = scored.withColumn("bucket",
      expr(s"pri div ${width}L").cast("int"))
    val counts = withB.groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (b, c) => val o = acc; acc += c; (b, o) }
    val offDf = broadcast(offs.toSeq.toDF("bucket", "offset"))
    val w = Window.partitionBy("bucket").orderBy("pri", "doc_id")
    withB.join(offDf, "bucket")
      .withColumn("pos",
        (row_number().over(w) - 1).cast("long") + col("offset"))
      .select(col("doc_id"), col("pos"))
  }

  /** Exact global rank over an arbitrary INTEGER sort key — the
    * counting-sort member of the two-phase-scan family, for keys whose
    * value distribution is SKEWED (document lengths, quality scores)
    * where [[deterministicShuffle]]'s arithmetic priority buckets
    * don't apply. Rank order is `(key, tiebreak)` ascending, rank is
    * 1-based and total (every row gets a distinct rank), output is
    * `(tiebreak-col, key-col, rank)`.
    *
    * Phase 1 groups per-key counts and turns them into exclusive
    * offsets with one window over the COUNTS table — that window is
    * intentionally unpartitioned, but it sees key-CARDINALITY rows,
    * never corpus rows (the classic trap this operator exists to
    * avoid: `row_number() OVER (ORDER BY key)` on the corpus collapses
    * the whole dataset into one task). Phase 2 broadcasts the
    * offsets back (cardinality-sized — guard your key: lengths and
    * percentage scores are fine, raw hashes are not) and adds a
    * per-key local row_number. No corpus-sized driver crossing, no
    * corpus-sized single task; the widest corpus shuffle is the hash
    * partition on the key.
    *
    * Skew: one giant key value (half the corpus at quality = 0)
    * concentrates its per-key window in one task. `salt > 1` pre-splits
    * every key into that many contiguous TIEBREAK RANGES — contiguity
    * (every tie in range g sorts before every tie in g+1) is what makes
    * the merge pure arithmetic: the phase-1 offsets just run over
    * `(key, range)` instead of `key` and the concatenated local ranks
    * ARE the global rank. (A `tiebreak mod s` salt would interleave the
    * groups and need a cross-group merge — that is why the salt cuts
    * ranges.) Costs one extra bounds aggregate and multiplies the
    * offsets table by `salt`; requires a numeric tiebreak. Output is
    * identical for every salt.
    */
  def keyedRank(df: DataFrame, keyCol: String,
                tieCol: String = "doc_id", salt: Int = 1): DataFrame = {
    val (g, grpCols) = saltGroups(df, keyCol, tieCol, salt)
    val counts = g.groupBy(grpCols.map(col): _*).agg(count(lit(1)).as("c"))
    val ord = Window.orderBy(grpCols.map(col): _*)
    val offs = counts
      .withColumn("offset", coalesce(
        sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(grpCols.map(col) :+ col("offset"): _*)
    val w = Window.partitionBy(grpCols.map(col): _*).orderBy(tieCol)
    g.join(broadcast(offs), grpCols)
      .withColumn("rank", col("offset") + row_number().over(w).cast("long"))
      .select(col(tieCol), col(keyCol), col("rank"))
  }

  /** Salt-range grouping for [[keyedRank]]/[[keyedQuantiles]]: cut the
    * tiebreak's VALUE RANGE into `salt` equal sub-ranges (order-
    * preserving integer arithmetic, the [[tokenShards]] bucket pattern)
    * and append the range id to the grouping columns. One singleton
    * bounds row crosses the driver; `salt <= 1` is the identity.
    */
  private def saltGroups(df: DataFrame, keyCol: String, tieCol: String,
                         salt: Int): (DataFrame, Seq[String]) = {
    require(salt >= 1, s"salt must be positive, got $salt")
    if (salt == 1) return (df, Seq(keyCol))
    val b = df.agg(min(col(tieCol).cast("long")),
      max(col(tieCol).cast("long"))).head()
    if (b.isNullAt(0)) return (df.withColumn("__salt", lit(0)),
      Seq(keyCol, "__salt"))
    val mn = b.getLong(0)
    val span = b.getLong(1) - mn + 1
    require(span > 0,
      s"$tieCol range [$mn, ${b.getLong(1)}] too wide for salt arithmetic")
    // ceil-div WITHOUT the (span + salt - 1) add — that form overflows
    // to a negative width when span is within salt of Long.MaxValue
    // (the require above passes) and ranks would come out silently
    // wrong instead of failing loud
    val width = span / salt + (if (span % salt == 0) 0L else 1L)
    // a NULL tiebreak must land in a real range (bucket 0, where the
    // window's nulls-first ordering puts it globally too) — a NULL
    // __salt would be dropped by the equi-join on (key, __salt) and
    // the "identical for every salt" contract would break on null
    // tiebreaks
    (df.withColumn("__salt",
      coalesce(
        expr(s"(CAST(`$tieCol` AS BIGINT) - ${mn}L) div ${width}L")
          .cast("int"),
        lit(0))),
      Seq(keyCol, "__salt"))
  }

  /** Quality-decile assignment — the curriculum/filter bucketing step:
    * every document's exact global rank by `keyCol` (ties by doc_id)
    * plus its 1-based n-quantile bucket `((rank-1)*n) div total + 1`
    * (pure integer arithmetic, so a SQL oracle replays it without
    * matching any engine's ntile size-split convention). Built on
    * [[keyedRank]]; the corpus total rides the broadcast offsets, not
    * a second scan. `salt` as in [[keyedRank]].
    */
  def keyedQuantiles(df: DataFrame, keyCol: String, n: Int,
                     tieCol: String = "doc_id", salt: Int = 1): DataFrame = {
    require(n >= 1, s"quantile count must be positive, got $n")
    val (g, grpCols) = saltGroups(df, keyCol, tieCol, salt)
    val counts = g.groupBy(grpCols.map(col): _*).agg(count(lit(1)).as("c"))
    val ord = Window.orderBy(grpCols.map(col): _*)
    val offs = counts
      .withColumn("offset", coalesce(
        sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("total", sum(col("c")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(grpCols.map(col) :+ col("offset") :+ col("total"): _*)
    val w = Window.partitionBy(grpCols.map(col): _*).orderBy(tieCol)
    g.join(broadcast(offs), grpCols)
      .withColumn("rank", col("offset") + row_number().over(w).cast("long"))
      .select(col(tieCol), col(keyCol), col("rank"),
        (expr(s"((rank - 1) * $n) div total") + 1).cast("int").as("bucket"))
  }

  /** The shared two-phase global prefix sum over doc token counts:
    * `(doc_id, n_tokens, before)` where `before` is the EXCLUSIVE
    * running token total in doc_id order — exact, distributed, and
    * never a single-partition window (order-preserving arithmetic id
    * buckets; per-bucket totals cross the driver as ≤ `buckets` rows;
    * local cumsum + broadcast offset). Returns None for an empty
    * corpus. [[tokenShards]] and [[sequencePack]] both build on it.
    */
  private def globalTokenOffsets(docs: DataFrame,
                                 buckets: Int): Option[DataFrame] = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    // phase 0: id range — one singleton aggregate row to the driver
    val bounds = toks.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return None
    val mn = bounds.getLong(0)
    val span = bounds.getLong(1) - mn + 1
    // an id range wider than Long.MaxValue (e.g. a negative hash-derived
    // sentinel next to positive ids) would wrap `span` negative and
    // assign garbage buckets downstream — fail loudly instead
    require(span > 0,
      s"doc_id range [$mn, ${bounds.getLong(1)}] too wide for exact bucket arithmetic")
    // order-preserving arithmetic buckets: integer `div` (no doubles —
    // Column `/` would round past 2^53), width chosen so ids map to at
    // most `buckets` buckets with no overflow anywhere in the id range
    val width = (span + buckets - 1) / buckets
    val withB = toks.withColumn("bucket",
      expr(s"(doc_id - ${mn}L) div ${width}L").cast("int"))
    // phase 1: per-bucket totals -> exclusive running offsets (driver
    // crossing is <= `buckets` rows — KB at any corpus scale)
    val totals = withB.groupBy("bucket").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offs = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val offDf = broadcast(offs.toSeq.toDF("bucket", "offset"))
    // phase 2: local exclusive cumsum + offset
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    Some(withB.join(offDf, "bucket")
      .withColumn("before",
        sum(col("n_tokens")).over(w) - col("n_tokens") + col("offset"))
      .select(col("doc_id"), col("n_tokens"), col("before")))
  }

  def tokenShards(docs: DataFrame, budget: Long,
                  buckets: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    globalTokenOffsets(docs, buckets) match {
      case None =>
        docs.select(col("doc_id").cast("long").as("doc_id"),
          lit(0).as("n_tokens"), lit(0L).as("shard")).limit(0)
      case Some(off) =>
        off.select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
          expr(s"before div ${budget}L").cast("long").as("shard"))
    }
  }

  /** Concat-and-chunk sequence packing — the LLM-pretraining packer:
    * the corpus's token stream (docs concatenated in doc_id order) is
    * cut into fixed-length training sequences of `seqLen` tokens, and
    * each (document × sequence) intersection is emitted with its
    * boundary metadata:
    *
    *   `(seq_id, doc_id, doc_start, seq_start, len)`
    *
    * — tokens `[doc_start, doc_start+len)` of `doc_id` occupy positions
    * `[seq_start, seq_start+len)` of sequence `seq_id`. Every sequence
    * except the last is exactly `seqLen` tokens; a long document spans
    * consecutive sequences; attention-mask/document-boundary info for
    * the trainer is precisely this row set.
    *
    * Execution shape: the [[globalTokenOffsets]] two-phase prefix sum
    * (never a single-partition window), then per-row ARITHMETIC — each
    * doc explodes into `n_tokens/seqLen + 1` rows via a sequence range,
    * with no join at all. Zero-token documents occupy no sequence and
    * are absent, like empty files in a real tokenizer pipeline.
    */
  def sequencePack(docs: DataFrame, seqLen: Long,
                   buckets: Int = 64): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    val empty = docs.sparkSession.emptyDataFrame
      .select(lit(0L).as("seq_id"), lit(0L).as("doc_id"),
        lit(0L).as("doc_start"), lit(0L).as("seq_start"), lit(0L).as("len"))
      .limit(0)
    globalTokenOffsets(docs, buckets) match {
      case None => empty
      case Some(off) =>
        val first = expr(s"before div ${seqLen}L")
        val last = expr(s"(before + n_tokens - 1) div ${seqLen}L")
        off.filter(col("n_tokens") > 0)
          .withColumn("seq_id", explode(sequence(first, last)))
          .select(
            col("seq_id").cast("long").as("seq_id"),
            col("doc_id"),
            greatest(lit(0L), col("seq_id") * seqLen - col("before"))
              .cast("long").as("doc_start"),
            greatest(lit(0L), col("before") - col("seq_id") * seqLen)
              .cast("long").as("seq_start"),
            (least((col("seq_id") + 1L) * seqLen, col("before") + col("n_tokens"))
              - greatest(col("seq_id") * seqLen, col("before")))
              .cast("long").as("len"))
    }
  }

}
