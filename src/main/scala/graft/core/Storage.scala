package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lang.Op.{StorageType, Sorted, BTree, Unsorted}

/** Physical column storage over parquet.
  *
  * Layout: each column version is a parquet dataset `(id: long, v: int)`.
  * "sorted"/"b+tree" columns are written range-partitioned and sorted by
  * value — parquet row-group min/max statistics then play the role the
  * reference's sorted projection / B+tree played (index scans become
  * row-group pruning; reference storage.c:1389-1490 builds real indexes,
  * which Catalyst + parquet subsume).
  *
  * Ids are dense at load time (0..n-1 + the column's current nextId),
  * assigned with a distributed zipWithIndex — never
  * `monotonically_increasing_id` (not dense) and never a single-partition
  * window (not scalable).
  */
object Storage {

  val columnSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", IntegerType, nullable = false)))

  def readColumn(spark: SparkSession, meta: ColumnMeta): DataFrame = {
    val dir = new java.io.File(meta.dataPath)
    if (!dir.exists() || meta.nextId == 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], columnSchema)
    else spark.read.schema(columnSchema).parquet(meta.dataPath)
  }

  /** Layout-aware write: indexed storage types are clustered by value so
    * range selects prune row groups.
    */
  def writeColumn(df: DataFrame, path: String, stype: StorageType): Unit = {
    val out = stype match {
      case Sorted | BTree =>
        // avoid a degenerate single range-partition on tiny data
        val parts = math.max(1, df.sparkSession.sparkContext.defaultParallelism / 2)
        df.repartitionByRange(parts, col("v")).sortWithinPartitions("v")
      case Unsorted => df
    }
    out.write.mode("overwrite").parquet(path)
  }

  /** Parse a headered CSV of ints into per-column DataFrames with dense,
    * row-aligned ordinals (reference csv.c:33-105: header names target
    * columns, one int per column per row). Returns (columnName -> df(ord, v))
    * in header order; `ord` is the 0-based row ordinal, the caller offsets
    * it by each target column's nextId.
    */
  def parseCsv(spark: SparkSession, file: String): Seq[(String, DataFrame)] = {
    val raw = spark.read.option("header", "true").csv(file)
    val names = raw.columns.toSeq
    val casted = raw.select(names.map(n => col(n).cast(IntegerType).as(n)): _*)
    val schema = StructType(
      StructField("ord", LongType, nullable = false) +:
        names.map(n => StructField(n, IntegerType, nullable = true)))
    val withOrd = spark.createDataFrame(
      casted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(i +: r.toSeq) },
      schema).cache()
    withOrd.count() // materialize once — per-column writers run concurrently
    names.map(n => n -> withOrd.select(col("ord"), col(n).as("v")))
  }
}
