package graft

import graft.sources.Ingest

/** Corpus ingestion: the JSONL/CSV document readers (schema contract,
  * corrupt-line tolerance) and deterministic content-derived ids.
  */
class IngestSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("jsonl reader: schema contract, corrupt lines skipped not fatal") {
    val dir = tmpDir("ingest_jsonl")
    val path = writeLines(dir, "docs.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "hola mundo", "lang": "es", "source": "web"}""",
      """this is not json at all""",
      """{"doc_id": 3, "text": "third doc"}""",
    ))
    val got = Ingest.documentsJsonl(spark, path)
    assert(got.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    val rows = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "hello world", 2L -> "hola mundo", 3L -> "third doc"))
    assert(Ingest.corruptCount(spark, path, "jsonl") == 1L)
  }

  test("observed probe: corrupt + null-text counted in the SAME pass, no cache") {
    val dir = tmpDir("ingest_obs")
    val path = writeLines(dir, "docs.jsonl", Seq(
      """{"doc_id": 1, "text": "good row", "lang": "en", "source": "web"}""",
      """not json""",
      """{"doc_id": 4}""",
      """{"doc_id": 5, "text": "another good one"}""",
      """also not json""",
    ))
    val (docs, obs) = Ingest.documentsObserved(spark, path, "jsonl")
    // the pipeline's own materialization is the only action taken
    assert(docs.count() == 2L)
    val m = obs.get
    // the downstream contract filter must NOT push below the observe
    // node: metrics see every parsed row, not just the survivors
    assert(m("n_parsed") == 5L)
    assert(m("n_corrupt") == 2L)
    assert(m("n_null_text") == 1L)
    // the convenience probe counts everything ingest discards
    assert(Ingest.corruptCount(spark, path, "jsonl") == 3L)
  }

  test("csv reader honors the same contract") {
    val dir = tmpDir("ingest_csv")
    val path = writeLines(dir, "docs.csv", Seq(
      "doc_id,text,lang,source",
      "7,some text here,en,crawl",
      "8,more text,es,crawl",
    ))
    val got = Ingest.documentsCsv(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(got == Set((7L, "some text here", "crawl"), (8L, "more text", "crawl")))
  }

  test("deterministic ids: stable across re-reads and partitioning") {
    import spark.implicits._
    val docs = Seq((0L, "alpha text", "en", "a"), (0L, "beta text", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val once = Ingest.withDeterministicIds(docs)
      .select("doc_id", "text").collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val again = Ingest.withDeterministicIds(docs.repartition(7))
      .select("doc_id", "text").collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(once == again)
    assert(once("alpha text") != once("beta text"))
    assert(once.values.forall(_ >= 0L), "60-bit ids stay non-negative")
  }

  test("text-lines reader: one doc per line, blanks dropped, stable ids") {
    val dir = tmpDir("ingest_text")
    val path = writeLines(dir, "dump.txt", Seq(
      "the first document in the dump",
      "",
      "   ",
      "the second document entirely",
      "the first document in the dump", // verbatim dup: same content id
    ))
    val docs = Ingest.documentsText(spark, path, source = "crawl-a")
    val rows = docs.collect()
    assert(rows.length == 3, "blank separator lines are not documents")
    assert(rows.forall(_.getString(3) == "crawl-a"))
    assert(rows.forall(r => r.isNullAt(2)), "lang is the pipeline's job")
    val ids = docs.select("doc_id", "text").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    // content-derived: the duplicate line carries the SAME id, and a
    // re-read reproduces every id
    assert(ids.size == 2)
    val again = Ingest.documentsText(spark, path, "crawl-a")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(again == ids)
  }

  test("orc reader honors the same contract as parquet") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmpDir("ingest_orc")
    val src = Seq(
      (1L, "some text here", "en", "s1"),
      (2L, "other text there", null, "s2"),
    ).toDF("doc_id", "text", "lang", "source")
    src.write.mode("overwrite").orc(s"$dir/docs.orc")
    val got = Ingest.documentsOrc(spark, s"$dir/docs.orc")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == src.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("corpus sink: partitioned write, bounded files, lossless round-trip") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmpDir("ingest_sink")
    val docs = (1L to 40L).map(i =>
      (i, s"document number $i", "en", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "lang", "source")
    Ingest.writeDocuments(docs, s"$dir/out", maxRecordsPerFile = 7L)
    // hive-style partition dirs per source value
    val subdirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("source=books", "source=web"), subdirs.toSeq)
    // file cap respected: 20 rows per partition at 7/file -> >= 3 files each
    for (sd <- subdirs) {
      val files = new java.io.File(s"$dir/out/$sd").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 3, s"$sd has ${files.length} files")
    }
    // lossless round-trip (partition column restored by the reader)
    val back = spark.read.parquet(s"$dir/out")
      .select("doc_id", "text", "lang", "source")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(back.toSeq == docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("jsonl round-trips into the pipeline operators") {
    val dir = tmpDir("ingest_pipe")
    val path = writeLines(dir, "docs.jsonl", Seq(
      """{"doc_id": 1, "text": "the same text twice over"}""",
      """{"doc_id": 2, "text": "the same text twice over"}""",
      """{"doc_id": 3, "text": "something else entirely here"}""",
    ))
    val groups = graft.pipeline.Dedup.exact(Ingest.documentsJsonl(spark, path))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L))
  }
}
