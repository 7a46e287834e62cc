package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.TextAnalysis

/** Streaming counterpart of the dedup family's exact path: content-
  * fingerprint deduplication over a document stream
  * `(doc_id, text, ts, ...)`.
  *
  * A training-data ingest sees the same document many times close
  * together (crawler re-fetches, source retries, mirrored feeds); the
  * streaming layer drops those before the batch near-dup passes ever
  * see them. `dropDuplicatesWithinWatermark` keys state by the same
  * normalized md5 fingerprint the batch `text_fingerprint` operator
  * uses and EVICTS each key once the watermark passes its event time —
  * state is bounded by the dedup horizon (`lateness`), never by
  * history, which is what lets the query run forever at ingest scale.
  * A duplicate arriving after its key was evicted is re-emitted by
  * design: cross-horizon dedup is the batch layer's job
  * ([[graft.pipeline.Dedup]]).
  */
object DocStreams {

  /** First sighting of each distinct content fingerprint within the
    * watermark horizon. Output schema: input columns + `fp`.
    */
  def dedupExact(docs: DataFrame, lateness: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprintExpr(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static incremental dedup — the streaming face of
    * [[graft.pipeline.Dedup.incremental]]: arriving documents are
    * dropped when their content fingerprint already exists in a STATIC
    * corpus fingerprint store (`store` must expose an `fp` column, the
    * [[TextAnalysis.fingerprintExpr]] convention), composed with the
    * watermark-horizon within-stream dedup of [[dedupExact]] so a
    * micro-batch near-duplicate storm collapses before the store probe.
    *
    * Scale shape: a stream-static LEFT ANTI equi-join — Spark re-plans
    * the static side per micro-batch, so a store persisted bucketed by
    * `fp` ([[graft.operators.Layout]] pattern) probes without
    * shuffling the store; per-batch cost is O(micro-batch), exactly
    * the [[graft.pipeline.Dedup.incremental]] contract. The store
    * snapshot is read-time: documents ingested while the query runs
    * join the store only after a restart materializes them — the
    * within-horizon state covers the gap, and cross-horizon residue is
    * the batch layer's job (same division of labor as [[dedupExact]]).
    */
  def dedupAgainstStore(docs: DataFrame, store: DataFrame,
                        lateness: String): DataFrame =
    dedupExact(docs, lateness)
      .join(store.select(col("fp")), Seq("fp"), "left_anti")

  /** The per-row text family applied at ingest: quality keep flag,
    * language prediction, and PII counts evaluated in ONE stateless
    * projection (the same expressions the batch operators use, so
    * stream and batch can never disagree), with dirty rows filtered
    * before they reach storage. Stateless -> no watermark, no state
    * store; each micro-batch is a pure map, which is what makes the
    * filter safe at any ingest rate.
    *
    * `dropPii = false` admits documents with PII counts > 0 (they carry
    * the counts for a downstream redaction pass); `true` drops them.
    */
  def qualityFilter(docs: DataFrame, dropPii: Boolean = false): DataFrame = {
    val piiTotal = TextAnalysis.piiPatterns
      .map { case (name, re) => regexp_count(col("text"), lit(re)) }
      .reduce(_ + _)
    val flagged = docs.select(col("*"),
      TextAnalysis.keepExpr(col("text")).as("keep"),
      TextAnalysis.langPredExpr(col("text")).as("lang_pred"),
      piiTotal.cast("long").as("n_pii"))
      .filter(col("keep") === 1)
    if (dropPii) flagged.filter(col("n_pii") === 0L) else flagged
  }

  /** Per-micro-batch corpus-sink function — the text-side twin of
    * [[VectorIngest.ivfBatchSink]]: admit a batch into a persisted
    * partitioned-parquet corpus at `dir/data`, exactly once per
    * content fingerprint. Batch rows must carry `doc_id` and `fp`
    * ([[dedupExact]]'s output contract). Per batch, in order:
    *
    *  1. **Idempotence marker**: `_applied_<batchId>` in `dir` skips a
    *     batch already absorbed (foreachBatch is at-least-once). The
    *     marker lands for EVERY applied batch, empty ones included —
    *     an empty batch's "write" is a no-op append.
    *  2. **Within-batch dedup** (defense in depth — [[dedupExact]]
    *     upstream already collapses the stream): first `doc_id` per
    *     `fp`, so admission is deterministic whatever the upstream.
    *  3. **Store probe**: LEFT ANTI against the persisted corpus's
    *     fingerprints — the streaming face of
    *     [[graft.pipeline.Dedup.incremental]], and the reason the sink
    *     is idempotent EVEN ACROSS the crash window the marker cannot
    *     close (a replayed batch whose rows were written but whose
    *     marker was lost re-probes the store and admits nothing).
    *     Per-batch cost is O(micro-batch) joined against the store's
    *     fp column (store scans prune to that column; bucket the store
    *     by fp at production scale to probe without shuffling it).
    *  4. **Append** the admitted rows partitioned by `partCol`
    *     (default `lang_pred`, [[qualityFilter]]'s output — corpus
    *     layout by predicted language, the shape mixture/resample
    *     reads), then drop the marker.
    */
  def corpusBatchSink(dir: String,
                      partCol: String = "lang_pred"): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(dir, s"_applied_$batchId")
      val data = s"$dir/data"
      if (!fs.exists(marker)) {
        // ONE action consumes the batch: the write job itself. Earlier
        // shapes probed emptiness first (isEmpty, then persist+count —
        // see graft.tools.StreamCostProbe history), but any probe is a
        // second evaluation of the regex-heavy upstream or a cache
        // round-trip of full text rows; skipping it entirely measured
        // another 2.4s off the replay sink (probe variant `sink_1act`
        // vs `sink`). An empty batch just writes nothing — and because
        // the STORE probe below guards on part-file presence rather
        // than directory existence, an empty append (dir with only
        // _SUCCESS) can never break the next batch's store read.
        val one = batch
          .withColumn("__rn", row_number().over(
            Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("__rn") === 1).drop("__rn")
        // store non-empty = the data dir holds a partition dir or a
        // bare part file. Metadata entries — _SUCCESS (empty append),
        // _temporary (a crashed write's committer scratch), dotfiles —
        // must NOT count, or schema inference on a parquet-less dir
        // would throw on every retry of a crashed first batch
        val hasStore = {
          val p = new Path(data)
          fs.exists(p) && fs.listStatus(p).exists { st =>
            val n = st.getPath.getName
            val meta = n.startsWith("_") || n.startsWith(".")
            (st.isDirectory && !meta) || (!meta && n.endsWith(".parquet"))
          }
        }
        val admitted =
          if (hasStore)
            one.join(spark.read.parquet(data).select(col("fp")),
              Seq("fp"), "left_anti")
          else one
        admitted.write.mode("append")
          .partitionBy(partCol).parquet(data)
        fs.create(marker, true).close()
      }
    }

  /** The composed streaming ingest loop for TEXT — quality gate, then
    * watermark-horizon dedup, then the idempotent persisted-corpus sink:
    * `docs -> qualityFilter -> dedupExact -> corpusBatchSink`. The gate
    * runs FIRST so rejected documents never occupy dedup state, and the
    * sink's store probe extends dedup across the watermark horizon and
    * across restarts — together the full division of labor this module
    * documents, in one query. The checkpoint carries source offsets;
    * sink idempotence is the marker + store probe above.
    */
  def toCorpus(docs: DataFrame, dir: String, checkpoint: String,
               lateness: String, dropPii: Boolean = false,
               partCol: String = "lang_pred"): StreamingQuery =
    dedupExact(qualityFilter(docs, dropPii), lateness)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(corpusBatchSink(dir, partCol))
      .start()

  /** Streaming chunker — the online RAG/embedding ingest path: each
    * arriving document explodes into its strided token windows via the
    * SAME [[TextAnalysis.tokenChunks]] transform the batch operator
    * uses (stateless sequence-explode + slice, so stream and batch can
    * never disagree chunk-for-chunk). Stateless -> no watermark, no
    * state store; safe at any ingest rate.
    */
  def chunkFlow(docs: DataFrame, width: Int, stride: Int): DataFrame =
    TextAnalysis.tokenChunks(docs, width, stride)
}
