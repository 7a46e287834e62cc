package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
