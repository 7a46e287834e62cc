package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.{AnnIndex, Ivf, Pq}

/** Streaming face of the incremental ANN index lifecycle: a vector
  * stream `(vec_id, embedding)` bound to a persisted IVF index, one
  * maintenance decision per micro-batch — the production ingest loop
  * that keeps a similarity index current as a corpus grows, composed
  * from the same parts the batch layer verifies
  * ([[Ivf.buildIndex]]/[[Ivf.appendIndex]]/[[Ivf.rebuildFromStore]],
  * `AnnIndex.appendGate`).
  *
  * Per micro-batch, in order:
  *  1. **Idempotence guard**: a durable `_applied_<batchId>` marker in
  *     the index dir skips a batch this index already absorbed.
  *     foreachBatch is at-least-once — after a crash-and-restart the
  *     engine REPLAYS the last uncommitted batch, and an unguarded
  *     append would double-code every vector in it. The marker lands
  *     AFTER the index commit (meta write), so the one remaining
  *     at-least-once window is a crash between commit and marker; the
  *     `coded_once` invariant the driver entry holds the index to is
  *     exactly the check that would catch that residue, and a
  *     transactional store (or cell files named by batch id) closes it
  *     at production scale.
  *  2. **Bootstrap**: no meta at `dir` → the first batch trains and
  *     builds the index ([[Ivf.buildIndex]]).
  *  3. **Append**: [[Ivf.appendIndex]] — one broadcast-assign pass over
  *     batch rows against the existing centroids, batch-proportional.
  *  4. **Retrain on refusal**: when the append gate refuses (the corpus
  *     has outgrown `maxGrowth` × what the centroids were trained on),
  *     [[Ivf.rebuildFromStore]] retrains from the index's own quantized
  *     lists + the batch — the staleness decision taken loudly at a
  *     batch boundary instead of decaying recall silently. Pass
  *     `retrainOnRefusal = false` to surface the refusal as a query
  *     failure instead (the deployment wants retrains scheduled, not
  *     inline).
  *
  * Stream contract: upstream assigns fresh `vec_id`s (the ingest
  * pipeline's dedup stages — [[DocStreams.dedupExact]] et al. — run
  * BEFORE vectors are minted); re-keyed duplicates are a corpus
  * question, not an index one.
  */
object VectorIngest {

  /** The per-micro-batch maintenance function — exposed so specs (and a
    * non-streaming backfill driver) can apply batches directly.
    */
  def ivfBatchSink(dir: String, nCells: Int, iters: Int,
                   maxGrowth: Double = 2.0,
                   retrainOnRefusal: Boolean = true): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(dir, s"_applied_$batchId")
      // the shared marker protocol ([[DocStreams.batchApplied]]): skip
      // via the per-batch marker OR the folded hwm, and write a marker
      // for EVERY applied batch — empty ones included, or a gap would
      // stop the contiguous-run marker fold forever
      if (!DocStreams.batchApplied(fs, dir, batchId)) {
        if (!batch.isEmpty) {
          if (AnnIndex.readMeta(spark, dir).isEmpty)
            Ivf.buildIndex(batch, dir, nCells, iters)
          else if (!Ivf.appendIndex(batch, dir, nCells, iters, maxGrowth)) {
            if (retrainOnRefusal) Ivf.rebuildFromStore(dir, batch, nCells, iters)
            else throw new IllegalStateException(
              s"append of batch $batchId would grow the corpus past " +
                s"$maxGrowth x the trained size at $dir — retrain required")
          }
        }
        fs.create(marker, true).close()
        // same housekeeping cadence as the corpus sink (the fp-store
        // fold is a no-op here — index dirs have no fp side table)
        DocStreams.maybeMaintain(spark, dir, batchId)
      }
    }

  /** [[ivfBatchSink]] for the production IVF-PQ composition
    * ([[Pq.buildIndexIvf]]/[[Pq.appendIndexIvf]]) — the same bootstrap
    * / append / marker protocol with one structural difference on gate
    * refusal: PQ codes are LOSSY, so unlike IVF the index cannot
    * retrain from its own contents. `corpusForRetrain` supplies the
    * full current corpus at refusal time — in the realistic
    * composition the SAME foreachBatch first appends the micro-batch
    * to the corpus table (lakehouse ingest) and then maintains the
    * index, so the snapshot the thunk reads already contains the
    * refused batch (VectorIngestSpec wires exactly that). With
    * `None`, refusal surfaces as a query failure — the deployment
    * schedules retrains instead of paying one inline.
    */
  def pqBatchSink(dir: String, m: Int, ks: Int, iters: Int, nCells: Int,
                  maxGrowth: Double = 2.0,
                  corpusForRetrain: Option[() => DataFrame] = None): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(dir, s"_applied_$batchId")
      if (!DocStreams.batchApplied(fs, dir, batchId)) {
        if (!batch.isEmpty) {
          if (AnnIndex.readMeta(spark, dir).isEmpty)
            Pq.buildIndexIvf(batch, dir, m, ks, iters, nCells)
          else if (!Pq.appendIndexIvf(batch, dir, m, ks, iters, nCells,
              maxGrowth)) {
            corpusForRetrain match {
              case Some(corpus) =>
                Pq.buildIndexIvf(corpus(), dir, m, ks, iters, nCells)
              case None => throw new IllegalStateException(
                s"append of batch $batchId would grow the corpus past " +
                  s"$maxGrowth x the trained size at $dir — retrain required")
            }
          }
        }
        fs.create(marker, true).close()
        DocStreams.maybeMaintain(spark, dir, batchId)
      }
    }

  /** Start the ingest query: every micro-batch of `vectors` flows
    * through [[ivfBatchSink]]. The checkpoint carries the source
    * offsets (exactly-once source progress; sink idempotence is the
    * marker's job above).
    */
  def toIvfIndex(vectors: DataFrame, dir: String, checkpoint: String,
                 nCells: Int, iters: Int, maxGrowth: Double = 2.0,
                 retrainOnRefusal: Boolean = true): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(ivfBatchSink(dir, nCells, iters, maxGrowth,
        retrainOnRefusal))
      .start()

  /** [[toIvfIndex]] for the IVF-PQ composition ([[pqBatchSink]]). */
  def toIvfPqIndex(vectors: DataFrame, dir: String, checkpoint: String,
                   m: Int, ks: Int, iters: Int, nCells: Int,
                   maxGrowth: Double = 2.0,
                   corpusForRetrain: Option[() => DataFrame] = None): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(pqBatchSink(dir, m, ks, iters, nCells, maxGrowth,
        corpusForRetrain))
      .start()
}
