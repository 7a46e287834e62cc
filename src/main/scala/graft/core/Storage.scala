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
  * assigned with a two-phase split-offset scheme (see [[parseCsv]]) —
  * never raw `monotonically_increasing_id` (not dense) and never a
  * single-partition window (not scalable).
  */
object Storage {

  val columnSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", IntegerType, nullable = false)))

  /** Read a column version. The `id < nextId` filter makes reads
    * snapshot-consistent against concurrent in-place appends (insert
    * appends a row with id == nextId BEFORE the catalog advance; a
    * reader holding the old meta must not see it, and a crash between
    * append and advance must leave the orphan invisible). nextId == 0
    * short-circuits to empty without touching the filesystem, so remote
    * dbDirs (hdfs://, s3a://) need no local-path existence probe.
    */
  def readColumn(spark: SparkSession, meta: ColumnMeta): DataFrame =
    if (meta.nextId == 0L)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], columnSchema)
    else spark.read.schema(columnSchema).parquet(meta.dataPath)
      .filter(org.apache.spark.sql.functions.col("id") < meta.nextId)

  /** Rows per value-clustered partition: ~4M ids+ints keep a partition
    * well under parquet's sweet spot while one partition per ~few dozen
    * MB still fans a 100 TB load across the cluster.
    */
  private val RowsPerIndexedPartition = 4000000L

  /** Layout-aware write: indexed storage types are clustered by value so
    * range selects prune row groups. `rowsHint` (when the caller already
    * knows the count) sizes the clustering: small columns sort in one
    * partition — same layout, minus repartitionByRange's range-sampling
    * job, which at interactive scale costs as much as the write itself.
    */
  def writeColumn(df: DataFrame, path: String, stype: StorageType,
                  rowsHint: Option[Long] = None): Unit = {
    val out = stype match {
      case Sorted | BTree =>
        val default = math.max(1, df.sparkSession.sparkContext.defaultParallelism / 2)
        if (rowsHint.exists(_ <= RowsPerIndexedPartition))
          // small column: a one-partition sort gives the same clustered
          // layout without repartitionByRange's sampling job
          df.repartition(1).sortWithinPartitions("v")
        else
          df.repartitionByRange(default, col("v")).sortWithinPartitions("v")
      case Unsorted => df
    }
    out.write.mode("overwrite").parquet(path)
  }

  /** Parquet part-file count of a version dir, via the path's Hadoop
    * FileSystem — correct for local paths AND remote dbDirs (hdfs://,
    * s3a://); 0 for a missing dir.
    */
  def partFileCount(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Parse a headered CSV of ints into per-column DataFrames with dense,
    * row-aligned ordinals (reference csv.c:33-105: header names target
    * columns, one int per column per row). Returns the cached shared scan
    * (caller unpersists it once the per-column writes land), the row
    * count, and (columnName -> df(ord, v)) in header order. `ord` is the
    * 0-based row ordinal; loads go only into EMPTY columns (double-load
    * ignored, storage.c:1863-1867), so the caller uses it as the dense id
    * directly — a future load-append would have to offset by nextId AND
    * lift the evalLoad double-load guard together.
    *
    * Ordinals are assigned WITHOUT leaving the DataFrame world: an RDD
    * `zipWithIndex` round-trip deserializes every row twice and caches
    * GenericRows — measured 4-10x the cost of the CSV scan itself.
    * Instead, `monotonically_increasing_id` is `(split << 33) + local`
    * for a deterministic file scan, so a first cheap pass counts rows
    * per split (over InternalRows, no conversion), the driver
    * prefix-sums the split offsets (bounded by the file's split count),
    * and `ord = offset(split) + local` via a broadcast equi-join on the
    * split id — zipWithIndex's own two-phase shape, kept inside
    * whole-stage codegen end to end, O(1) per row at any split count.
    * Both passes see identical splits and order (file scans are
    * deterministic and the broadcast join never reshuffles the scan
    * side).
    */
  def parseCsv(spark: SparkSession, file: String)
      : (DataFrame, Long, Seq[(String, DataFrame)]) = {
    import spark.implicits._
    val raw = spark.read.option("header", "true").csv(file)
    val names = raw.columns.toSeq
    // non-numeric/empty cells parse to 0, matching the reference's atoi
    // (csv.c:81) — a null here would crash emission and skew aggregates
    val casted = raw.select(
      names.map(n => coalesce(col(n).cast(IntegerType), lit(0)).as(n)): _*)
    // pass 1: rows per scan split, no row conversion, no shuffle
    val counts = casted.queryExecution.toRdd
      .mapPartitionsWithIndex((i, it) => Iterator((i.toLong, it.size.toLong)))
      .collect().sortBy(_._1)
    val rows = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (s, c) => val o = acc; acc += c; (s, o) }
    val offsetsDf = broadcast(
      offsets.toSeq.toDF("__graft_split", "__graft_off"))
    val mid = monotonically_increasing_id()
    // pass 2 (the cache materialization): ord from the split offset +
    // the in-split local index; the id columns are computed ON the scan
    // side, before the broadcast probe, so split ids match pass 1's
    val withOrd = casted
      .withColumn("__graft_split", shiftrightunsigned(mid, 33))
      .withColumn("__graft_local", mid.bitwiseAND(lit((1L << 33) - 1)))
      .join(offsetsDf, "__graft_split")
      .select((col("__graft_off") + col("__graft_local")).as("ord") +:
        names.map(col): _*)
      .cache()
    // NOT materialized here: the first concurrent column writer builds
    // the cache blocks (racing writers at worst duplicate a partition's
    // parse across idle cores — BlockManager keeps one copy), which
    // overlaps the cache build with the first write instead of paying a
    // dedicated pass. Rows come from the split counts, so nothing needs
    // a count().
    (withOrd, rows, names.map(n => n -> withOrd.select(col("ord"), col(n).as("v"))))
  }
}
