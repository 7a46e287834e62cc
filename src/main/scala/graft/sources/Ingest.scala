package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion: one schema contract for the document table the
  * pipeline operators consume (`doc_id long, text string` plus optional
  * `lang`, `source`, timestamps), readable from the formats training
  * corpora actually ship in — JSONL (the common interchange form),
  * CSV, and parquet.
  *
  * Scale notes: every reader passes an EXPLICIT schema — schema inference
  * reads the data twice and samples types non-deterministically, both
  * wrong at corpus scale. JSONL/CSV readers are line-splittable, so a
  * 100 TB directory parallelizes to one task per split with no driver
  * involvement; corrupt records land in a `_corrupt` column (PERMISSIVE)
  * instead of killing the job — a crawl shard with one bad line must not
  * fail an ingest stage. Missing ids are assigned deterministically from
  * content via [[withDeterministicIds]] (never
  * `monotonically_increasing_id`, which renumbers on every re-read and
  * breaks dedup joins between runs).
  */
object Ingest {

  /** The pipeline document contract. `_corrupt` carries PERMISSIVE-mode
    * parse failures for audit; it is dropped from the returned table.
    */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType),
  ))

  private def finish(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt").isNull && col("text").isNotNull)
      .select("doc_id", "text", "lang", "source")

  /** Ingest-quality metrics, measured during whatever action first
    * materializes the returned frame — `observe()` rides the ingest scan
    * itself, so the probe costs no cache and no second read (at 100 TB a
    * counting re-read of the corpus is a non-starter). Metrics:
    * `n_corrupt` (PERMISSIVE parse failures), `n_null_text` (parsed rows
    * violating the contract — a null `text` is discarded by the pipeline
    * and must be counted, not silently dropped), `n_parsed` (all rows the
    * reader produced). Read them from the returned Observation after any
    * action on the frame.
    */
  def documentsObserved(spark: SparkSession, path: String,
                        format: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = raw(spark, path, format).observe(obs,
      sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(col("_corrupt").isNull && col("text").isNull, 1L)
        .otherwise(0L)).as("n_null_text"),
      count(lit(1)).as("n_parsed"))
    (finish(observed), obs)
  }

  /** The ONE schema'd PERMISSIVE reader behind every raw-format entry
    * point — the corrupt-count probe must measure the same parse the
    * pipeline ingests, so the option block exists exactly once.
    */
  private def raw(spark: SparkSession, path: String, format: String): DataFrame = {
    val reader = spark.read.schema(documentSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
    format match {
      case "jsonl" => reader.json(path)
      case "csv"   => reader.option("header", "true").csv(path)
      case other   => throw new IllegalArgumentException(
        s"unsupported corpus format: $other (jsonl/csv)")
    }
  }

  /** Count of rows ingest discards — PERMISSIVE parse rejections PLUS
    * parsed rows with a null `text` (the contract violation [[finish]]
    * filters out). This is the ingest-quality probe a pipeline alerts on
    * (schema drift shows up here first). Implemented over
    * [[documentsObserved]]: one pass, no cache — the standalone action
    * here exists only for this convenience form; a real pipeline reads
    * the Observation off the materialization it already does.
    */
  def corruptCount(spark: SparkSession, path: String, format: String): Long = {
    val (docs, obs) = documentsObserved(spark, path, format)
    docs.write.format("noop").mode("overwrite").save()
    val row = obs.get
    row("n_corrupt").asInstanceOf[Long] + row("n_null_text").asInstanceOf[Long]
  }

  /** JSONL corpus: one JSON object per line, `{"doc_id":…,"text":…}`
    * with optional lang/source fields.
    */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame =
    finish(raw(spark, path, "jsonl"))

  /** Headered CSV corpus with the same contract. */
  def documentsCsv(spark: SparkSession, path: String): DataFrame =
    finish(raw(spark, path, "csv"))

  /** Parquet corpus (already typed; no corrupt-record channel). */
  def documentsParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("doc_id").cast("long"), col("text"),
        col("lang"), col("source"))

  /** Raw text-lines corpus — one document per line, the shape crawl
    * extracts and classic LM dumps ship in (no ids, no metadata).
    * Blank lines are dropped (dump separators, not documents); `lang`
    * is null (language-ID is the pipeline's job, [[graft.pipeline.TextAnalysis.langId]]);
    * `source` is the caller's label for the dump; ids are
    * content-derived via [[withDeterministicIds]] so re-reads and
    * incremental ingests agree. Line-splittable like JSONL/CSV — one
    * task per split at any corpus size. Raw lines cannot fail parsing,
    * so there is no corrupt channel.
    */
  def documentsText(spark: SparkSession, path: String,
                    source: String): DataFrame =
    withDeterministicIds(spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(lit(0L).as("doc_id"), col("value").as("text"),
        lit(null).cast("string").as("lang"), lit(source).as("source")))

  /** ORC corpus (columnar like parquet: already typed, predicate/column
    * pushdown native, no corrupt-record channel).
    */
  def documentsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
      .select(col("doc_id").cast("long"), col("text"),
        col("lang"), col("source"))

  /** Corpus sink — the write-back step of a prep pipeline: partitioned
    * parquet (default by `source`) with the two knobs that matter at
    * 100 TB. Repartitioning BY THE PARTITION COLUMNS first means each
    * output directory is written by the tasks that own that key — the
    * default (every task holding rows of every partition value) writes
    * tasks x partitions files, the classic small-files explosion that
    * makes the NEXT job's listing/scan driver-bound. `maxRecordsPerFile`
    * caps the other direction (one giant file per partition would
    * serialize the next scan). A skewed partition value concentrates in
    * one task-group; raise parallelism within a hot key by adding a
    * salt column to `partitionCols` upstream if a real corpus needs it.
    */
  def writeDocuments(docs: DataFrame, path: String,
                     partitionCols: Seq[String] = Seq("source"),
                     maxRecordsPerFile: Long = 1000000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    docs.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Deterministic content-derived ids for corpora that ship without
    * them: the first 60 bits of md5(source, text) — stable across
    * re-reads, re-partitioning, and re-runs (unlike
    * `monotonically_increasing_id`), so incremental ingests and dedup
    * joins agree between runs. Distinct documents collide with
    * probability ~n^2/2^61; exact-dedup grouping keys on content anyway,
    * so a collision cannot merge two different texts downstream of
    * [[graft.pipeline.Dedup.exact]] with `byHash = false`.
    */
  def withDeterministicIds(docs: DataFrame): DataFrame =
    docs.withColumn("doc_id",
      conv(substring(md5(to_binary(
        concat_ws("\u0000", coalesce(col("source"), lit("")), col("text")),
        lit("utf-8"))), 1, 15), 16, 10).cast("long"))
}
