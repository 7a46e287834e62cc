package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{AnnIndex, Ivf, Similarity}
import graft.streaming.{Replay, VectorIngest}

/** The streaming ANN ingest loop: micro-batches bound to a persisted
  * IVF index with bootstrap / append / retrain-on-refusal decisions per
  * batch, plus the at-least-once idempotence marker.
  */
class VectorIngestSpec extends SparkSpec {
  import VectorIngestSpec.Vec
  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-vingest-$tag"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir-ckpt"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir-corpus"), true)
    dir
  }

  private lazy val feed: Seq[Vec] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy("vec_id").collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1))).toSeq

  private def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  test("bootstrap + appends leave every vector coded once and findable") {
    val dir = freshDir("append")
    import spark.implicits._
    Replay.replayTo(spark, Replay.chunks(feed, 3))(in =>
      VectorIngest.toIvfIndex(in, dir, s"$dir-ckpt", nCells = 8, iters = 2,
        maxGrowth = 4.0))
    val lists = spark.read.parquet(s"$dir/lists")
    val n = emb.count()
    assert(lists.count() == n)
    assert(lists.select("nid").distinct().count() == n)
    assert(AnnIndex.isCurrent(emb, dir, Seq(8, 2)), "meta stale after ingest")
    // nTrained stays at the bootstrap batch: appends never retrain
    val meta = AnnIndex.readMeta(spark, dir).get
    assert(meta.nTrained < n && meta.n == n,
      s"expected append-only history, got nTrained=${meta.nTrained} n=${meta.n}")
    // a vector streamed in the LAST batch is findable at probe time
    val lastId = feed.last.vec_id
    val probe = Ivf.probeIndex(dir,
      Similarity.prepared(emb).filter(col("vec_id") === lastId),
      k = 3, nprobe = 4)
    assert(probe.count() == 3, "streamed vector did not probe to k results")
  }

  test("gate refusal retrains from the index's own lists (loud, not silent)") {
    val dir = freshDir("retrain")
    import spark.implicits._
    // maxGrowth=1.5: batch 1 (doubling the corpus) refuses the append
    // path and must retrain; batch 2 then appends against the NEW
    // training size (3/2 = 1.5 <= 1.5)
    Replay.replayTo(spark, Replay.chunks(feed, 3))(in =>
      VectorIngest.toIvfIndex(in, dir, s"$dir-ckpt", nCells = 8, iters = 2,
        maxGrowth = 1.5))
    val n = emb.count()
    val meta = AnnIndex.readMeta(spark, dir).get
    assert(meta.n == n)
    assert(meta.nTrained > n / 3, s"retrain never happened: ${meta.nTrained}")
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.count() == n && lists.select("nid").distinct().count() == n)
    // retrained centroids still carry the full codebook
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
    // and the scratch staging dir does not linger as phantom lists
    assert(AnnIndex.isCurrent(emb, dir, Seq(8, 2)))
  }

  test("retrainOnRefusal=false surfaces the refusal instead of decaying") {
    val dir = freshDir("refuse")
    import spark.implicits._
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Replay.replayTo(spark, Replay.chunks(feed, 2))(in =>
        VectorIngest.toIvfIndex(in, dir, s"$dir-ckpt", nCells = 8, iters = 2,
          maxGrowth = 1.2, retrainOnRefusal = false))
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("retrain required"))))
  }

  test("PQ ingest: bootstrap + appends code every vector exactly once") {
    val dir = freshDir("pq")
    import spark.implicits._
    Replay.replayTo(spark, Replay.chunks(feed, 3))(in =>
      VectorIngest.toIvfPqIndex(in, dir, s"$dir-ckpt", m = 32, ks = 16,
        iters = 2, nCells = 8, maxGrowth = 4.0))
    val codes = spark.read.parquet(s"$dir/codes")
    val n = emb.count()
    assert(codes.count() == n && codes.select("nid").distinct().count() == n)
    assert(AnnIndex.isCurrent(emb, dir, Seq(32, 16, 2, 8)))
  }

  test("PQ gate refusal retrains from the corpus-table snapshot") {
    // the realistic composition: ONE foreachBatch first lands the
    // micro-batch in the corpus table, then maintains the index — so
    // the retrain snapshot already contains the refused batch (PQ codes
    // are lossy; unlike IVF the index cannot retrain from itself)
    val dir = freshDir("pqretrain")
    val corpusPath = s"$dir-corpus"
    import spark.implicits._
    val base = VectorIngest.pqBatchSink(dir, m = 32, ks = 16, iters = 2,
      nCells = 8, maxGrowth = 1.5,
      corpusForRetrain = Some(() => spark.read.parquet(corpusPath)))
    val sink: (DataFrame, Long) => Unit = (b, id) => {
      b.write.mode("append").parquet(corpusPath) // lakehouse ingest first
      base(b, id)
    }
    Replay.replayTo(spark, Replay.chunks(feed, 3))(in =>
      in.writeStream.option("checkpointLocation", s"$dir-ckpt")
        .outputMode("append").foreachBatch(sink).start())
    val n = emb.count()
    val meta = AnnIndex.readMeta(spark, dir).get
    assert(meta.n == n)
    assert(meta.nTrained > n / 3, s"retrain never happened: ${meta.nTrained}")
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == n && codes.select("nid").distinct().count() == n)
  }

  test("a replayed batch id is idempotent under the applied marker") {
    val dir = freshDir("idem")
    val half = feed.take(feed.size / 2)
    import spark.implicits._
    val sink = VectorIngest.ivfBatchSink(dir, nCells = 8, iters = 2,
      maxGrowth = 4.0)
    val batchDf = half.toDF()
    sink(batchDf, 0L) // bootstrap
    val coded = spark.read.parquet(s"$dir/lists").count()
    sink(batchDf, 0L) // crash-replay of the SAME batch id: must no-op
    assert(spark.read.parquet(s"$dir/lists").count() == coded,
      "replayed batch double-coded the index")
    // an empty batch codes nothing but still writes its marker — a
    // marker GAP would stop the contiguous-run fold forever
    sink(batchDf.limit(0), 1L)
    assert(spark.read.parquet(s"$dir/lists").count() == coded)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_applied_1")),
      "empty batch must still be marked applied")
  }

  test("ingest markers fold at the maintenance cadence; folded ids still skip") {
    val dir = freshDir("maint")
    import spark.implicits._
    val sink = VectorIngest.ivfBatchSink(dir, nCells = 8, iters = 2,
      maxGrowth = 16.0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.conf.set("graft.sink.maintainEvery", "4")
    spark.conf.set("graft.sink.maintainAsync", "false")
    try {
      val quarters = Replay.chunks(feed, 4)
      quarters.zipWithIndex.foreach { case (q, i) =>
        sink(q.toDF(), i.toLong)
      }
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("_applied")).toSet
      assert(names == Set("_applied_hwm=3"), names)
      // a replay of a FOLDED id is skipped via the watermark alone
      val coded = spark.read.parquet(s"$dir/lists").count()
      sink(quarters.head.toDF(), 0L)
      assert(spark.read.parquet(s"$dir/lists").count() == coded,
        "folded batch id replay re-coded the index")
      // every vector coded exactly once across the folded run
      val n = emb.count()
      val lists = spark.read.parquet(s"$dir/lists")
      assert(lists.count() == n &&
        lists.select("nid").distinct().count() == n)
    } finally {
      spark.conf.unset("graft.sink.maintainEvery")
      spark.conf.unset("graft.sink.maintainAsync")
    }
  }
}

private[graft] object VectorIngestSpec {
  final case class Vec(vec_id: Long, embedding: Seq[Float])
}
