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
    * int quantity is, at every shipped sf. Packed into one long.
    *
    * Field radii and their hard validity bounds: linenumber < 10,
    * partkey < 1e6, suppkey < 1e4, qty < 100, and orderkey <= ~920k
    * before BIGINT overflow. The shipped testdata (<= sf0.1) maxes at
    * orderkey 149,999 / partkey 19,999 / suppkey 999 / qty 50 — inside
    * every bound with >=6x headroom. A hypothetical sf1 table would
    * break the suppkey radix (TPC-H suppkey reaches 1e4) — this key is a
    * test-harness adapter for the shipped tables, not a general encoder.
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
