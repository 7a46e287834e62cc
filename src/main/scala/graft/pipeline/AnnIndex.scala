package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared plumbing for the persisted ANN index lifecycle: build once →
  * write codebooks/codes/cells as parquet → probe many. Mirrors the
  * reference engine's load-time index build (kstore builds its sorted/
  * btree projections once during `column_load`, storage.c:1389-1490,
  * and every later select probes them) — the trained-ANN counterpart
  * here is k-means codebooks and packed codes trained once at build
  * time, so a search never pays training again.
  *
  * Every index directory carries a `meta` table written LAST by the
  * build: `(n, id_sum, params)` — the corpus fingerprint (row count +
  * id sum, one cheap two-column aggregate) plus the build parameters.
  * `isCurrent` re-derives the fingerprint from the live table and
  * compares, so a swapped/regenerated corpus or changed hyperparameters
  * trigger a rebuild, while a crashed build (meta absent or stale)
  * never serves a half-written index.
  *
  * Scale note: the fingerprint costs one scan of the id column per
  * `ensure*` call — the right freshness check at verification scale. A
  * production 100 TB deployment versions the CORPUS PATH instead
  * (immutable snapshot directories), making `isCurrent` a pure
  * path-equality check with zero scans; the build/probe split is the
  * part that carries over unchanged.
  */
object AnnIndex {

  /** Root directory for the driver queries' persisted indexes, keyed by
    * the SF dir so scales never collide.
    */
  def rootFor(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-ann-index/" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** `(n, id_sum)` — the corpus fingerprint. */
  def fingerprint(emb: DataFrame, idCol: String = "vec_id"): (Long, Long) = {
    val r = emb.agg(count(lit(1)).as("n"),
      coalesce(sum(col(idCol).cast("long")), lit(0L)).as("s")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The freshness record as data: corpus fingerprint, build params,
    * and `nTrained` — the corpus size the codebooks/centroids were
    * TRAINED on. Appends advance the fingerprint arithmetically but
    * never touch `nTrained`, so `n / nTrained` is the index's staleness
    * ratio: how far the corpus has drifted from what the quantizers
    * were fit to.
    */
  final case class Meta(n: Long, idSum: Long, params: Seq[Long],
                        nTrained: Long)

  /** Read the freshness record, or None if absent/unreadable — which
    * callers treat as "stale, rebuild". The record is ONE tiny
    * tab-separated line read straight off the filesystem: a 4-value
    * freshness stamp needs no Spark job on either side, and the
    * previous one-row-parquet form cost a full job cycle per
    * read/write — several per build/append/ensure, pure fixed overhead
    * charged to every index-lifecycle operation. A partial file from a
    * crashed write fails the parse and reads as stale, the same
    * crash contract the parquet form had.
    */
  def readMeta(spark: org.apache.spark.sql.SparkSession,
               dir: String): Option[Meta] =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.getFileStatus(p).isFile) return None
      val in = fs.open(p)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val f = line.split('\t')
      val params =
        if (f(3).isEmpty) Seq.empty[Long]
        else f(3).split(',').toSeq.map(_.toLong)
      Some(Meta(f(0).toLong, f(1).toLong, params, f(2).toLong))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Write the freshness record; call LAST in every build/append so
    * partial writes read as stale.
    */
  def writeMetaValues(spark: org.apache.spark.sql.SparkSession, dir: String,
                      meta: Meta): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a legacy parquet-dir meta (or crashed remnant) must not shadow
    // the file write
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory) fs.delete(p, true)
    val out = fs.create(p, true)
    try out.write(
      s"${meta.n}\t${meta.idSum}\t${meta.nTrained}\t${meta.params.mkString(",")}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Build-time freshness record: trained-on = indexed corpus. */
  def writeMeta(emb: DataFrame, dir: String, params: Seq[Long]): Unit = {
    val (n, idSum) = fingerprint(emb)
    writeMetaValues(emb.sparkSession, dir, Meta(n, idSum, params, n))
  }

  /** Shared append gate: read the live meta, fingerprint the batch, and
    * decide whether an in-place append keeps the index healthy.
    * Returns `Some(updatedMeta)` — what the appender must write LAST
    * after landing the batch — or None when the post-append corpus
    * would exceed `maxGrowth` × the trained size and the caller should
    * retrain ([[graft.pipeline.Ivf.buildIndex]]/
    * [[graft.pipeline.Pq.buildIndexIvf]]) instead: quantizers fit to a
    * corpus a fraction of the current one lose recall, and the
    * threshold makes that drift a loud decision, not silent decay.
    */
  def appendGate(batch: DataFrame, dir: String, params: Seq[Long],
                 maxGrowth: Double): Option[Meta] = {
    val spark = batch.sparkSession
    val meta = readMeta(spark, dir).getOrElse(throw new IllegalStateException(
      s"no current index at $dir to append to — build first"))
    require(meta.params == params,
      s"index at $dir built with params ${meta.params}, append asked $params")
    val (bn, bSum) = fingerprint(batch)
    if (meta.n + bn > maxGrowth * meta.nTrained) None
    else Some(meta.copy(n = meta.n + bn, idSum = meta.idSum + bSum))
  }

  /** True iff `dir` holds an index built from the CURRENT corpus with
    * exactly `params`. Any read/parse failure means "not current".
    */
  def isCurrent(emb: DataFrame, dir: String, params: Seq[Long]): Boolean =
    readMeta(emb.sparkSession, dir) match {
      case None => false
      case Some(m) =>
        val (n, idSum) = fingerprint(emb)
        m.n == n && m.idSum == idSum && m.params == params
    }
}
