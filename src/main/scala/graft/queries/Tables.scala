package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Readers for the driver's parquet tables + adapters into the engine's
  * column representation `(id: long, v: int)`.
  *
  * The adapter id for lineitem is the natural unique key
  * `l_orderkey*10 + l_linenumber` (linenumber <= 7) — deterministic, so a
  * DuckDB oracle can reconstruct it; dense ids (zipWithIndex) are only for
  * engine-owned storage where the oracle never sees raw ids.
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** lineitem's deterministic position key. Neither (l_orderkey,
    * l_linenumber) nor the 4-tuple with partkey+suppkey is unique in the
    * synthetic data (one 4-tuple collision at sf0.001); the 5-tuple with
    * int quantity is, at every shipped sf. Packed into one long — max
    * ~1.5e18 at sf0.1's key ranges (orderkey<=150k, partkey<=20k,
    * suppkey<=1k, qty<=50), well inside BIGINT.
    */
  val liId: Column =
    (((col("l_orderkey") * 10 + col("l_linenumber")) * 1000000 + col("l_partkey")) * 10000 +
      col("l_suppkey")) * 100 + col("l_quantity").cast(IntegerType)

  /** Adapt one lineitem expression to an engine column `(id, v)`. */
  def liCol(spark: SparkSession, dir: String, v: Column): DataFrame =
    lineitem(spark, dir).select(liId.as("id"), v.cast(IntegerType).as("v"))

  /** Adapt one orders expression to an engine column keyed by o_orderkey. */
  def ordCol(spark: SparkSession, dir: String, v: Column): DataFrame =
    orders(spark, dir).select(col("o_orderkey").cast("long").as("id"),
      v.cast(IntegerType).as("v"))
}
