package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout control for repeated big-big joins: write a table
  * hash-bucketed (and sorted) on its join key so every later equi-join
  * on that key between same-bucketed tables runs with ZERO exchanges —
  * the shuffle is paid once per table lifetime at write, not once per
  * query. This is the bucketed-table counterpart of the engine's
  * value-clustered parquet layout (core/Storage) and the standard
  * cluster-scale answer to "this join's shuffle is the bottleneck":
  * at 100 TB a fact-fact join shuffle moves the whole table; bucketed
  * layout moves nothing.
  */
object Layout {

  /** Write `df` as a bucketed+sorted external parquet table at `path`,
    * registered in the session catalog as `table` (replacing any
    * previous registration). `spark.table(table)` then exposes the
    * bucketing to the planner; joins between tables bucketed on the
    * same key with the same `numBuckets` plan with no shuffle on
    * either side, and the per-bucket `sortBy` lets sort-merge join
    * skip its sort too.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    path: String, key: String, numBuckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(numBuckets, key).sortBy(key).saveAsTable(table)
    spark.table(table)
  }
}
