package graft

import org.apache.spark.sql.Row
import graft.queries.PipelineQueries

/** The oracle-exact invariant singletons the approximate ANN/LSH driver
  * entries emit (see PipelineQueries.probeInvariants and the *_build
  * scaladocs): each entry must return exactly one row whose count
  * column matches the population the DuckDB oracle derives and whose
  * boolean invariants are all true. A false boolean here is exactly
  * the signal that fails the driver's hash compare — this spec pins it
  * in-tree at sf0.001 so a probe/build regression is caught before
  * round time.
  */
class AnnInvariantSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def singleton(df: org.apache.spark.sql.DataFrame): Row = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected singleton, got ${rows.length}")
    rows.head
  }

  private def allBoolsTrue(r: Row): Unit =
    r.schema.fields.zipWithIndex.foreach {
      case (f, i) if f.dataType == org.apache.spark.sql.types.BooleanType =>
        assert(r.getBoolean(i), s"invariant ${f.name} is false")
      case _ => ()
    }

  private lazy val nVectors =
    spark.read.parquet(s"$sf/embeddings.parquet").count()
  private lazy val nQueries =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100).count()

  test("probe entries emit all-true invariants over the full query set") {
    for (q <- Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
        "ann_lsh" -> PipelineQueries.annLsh,
        "ann_ivf" -> PipelineQueries.annIvf,
        "ann_pq" -> PipelineQueries.annPq,
        "ann_ivfpq" -> PipelineQueries.annIvfPq)) {
      val r = singleton(q._2(spark, sf))
      assert(r.getLong(r.fieldIndex("n_queries")) == nQueries, q._1)
      allBoolsTrue(r)
    }
  }

  test("build entries emit all-true invariants over the full corpus") {
    for (q <- Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
        "ann_ivf_build" -> PipelineQueries.annIvfBuild,
        "ann_pq_build" -> PipelineQueries.annPqBuild,
        "ann_ivfpq_build" -> PipelineQueries.annIvfPqBuild)) {
      val r = singleton(q._2(spark, sf))
      assert(r.getLong(r.fieldIndex("n_vectors")) == nVectors, q._1)
      allBoolsTrue(r)
    }
  }

  test("dedup_embedding_lsh emits subset + recall invariants") {
    val r = singleton(PipelineQueries.dedupEmbeddingLsh(spark, sf))
    assert(r.getLong(r.fieldIndex("n_exact")) > 0)
    allBoolsTrue(r)
  }
}
