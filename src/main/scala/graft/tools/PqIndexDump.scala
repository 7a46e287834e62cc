package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Diagnostic: dump a parquet file's row-group / page-index layout
  * (row groups, pages per column chunk, rows per page, bloom filter
  * presence) — the physical facts the fingerprint-store probe design
  * rests on. Usage: `sbt "runMain graft.tools.PqIndexDump <file>"`.
  */
object PqIndexDump {
  def main(args: Array[String]): Unit = {
    val in = HadoopInputFile.fromPath(new Path(args(0)), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala
      println(s"rowGroups=${blocks.size}")
      blocks.zipWithIndex.foreach { case (b, i) =>
        b.getColumns.asScala.foreach { cc =>
          val oi = r.readOffsetIndex(cc)
          val nPages = if (oi == null) -1 else oi.getPageCount
          val ci = r.readColumnIndex(cc)
          val bloom = r.readBloomFilter(cc)
          println(s"rg=$i col=${cc.getPath} rows=${b.getRowCount} " +
            s"pages=$nPages columnIndex=${ci != null} bloom=${bloom != null}")
          if (oi != null && oi.getPageCount > 0) {
            val rows0 = if (oi.getPageCount > 1)
              oi.getFirstRowIndex(1) - oi.getFirstRowIndex(0)
            else b.getRowCount
            println(s"  rowsPerPage(first)=$rows0")
          }
        }
      }
    } finally r.close()
  }
}
