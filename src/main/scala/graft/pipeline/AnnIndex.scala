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

  /** Write the freshness record; call LAST in every build so partial
    * builds read as stale.
    */
  def writeMeta(emb: DataFrame, dir: String, params: Seq[Long]): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (n, idSum) = fingerprint(emb)
    Seq((n, idSum, params)).toDF("n", "id_sum", "params")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** True iff `dir` holds an index built from the CURRENT corpus with
    * exactly `params`. Any read/parse failure means "not current".
    */
  def isCurrent(emb: DataFrame, dir: String, params: Seq[Long]): Boolean =
    try {
      val m = emb.sparkSession.read.parquet(s"$dir/meta").head()
      val (n, idSum) = fingerprint(emb)
      m.getLong(m.fieldIndex("n")) == n &&
        m.getLong(m.fieldIndex("id_sum")) == idSum &&
        m.getSeq[Long](m.fieldIndex("params")) == params
    } catch { case scala.util.control.NonFatal(_) => false }
}
