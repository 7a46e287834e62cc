package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{DbException, Engine}

/** Script-runner CLI — the engine's user surface, playing the role of the
  * reference's client (/root/reference/src/client/client.c): feed it a
  * script file (or stdin) of operator lines, results go to stdout in the
  * reference's text formats (ids / values one per line, `(a,b,c)` tuples).
  *
  * Usage: Cli <dbDir> [scriptFile]   (no scriptFile -> read stdin)
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: Cli <dbDir> [scriptFile]"); sys.exit(2) }
    val dbDir = args(0)
    val script =
      if (args.length > 1) new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1))))
      else scala.io.Source.stdin.mkString
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, dbDir)
    try engine.execute(script).foreach(println)
    catch {
      case e: DbException => System.err.println(e.getMessage); sys.exit(1)
    }
    finally spark.stop()
  }
}
