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
}
