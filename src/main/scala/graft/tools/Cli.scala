package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{DbException, Engine}
import graft.lang.Parser

/** Script-runner CLI — the engine's user surface, playing the role of the
  * reference's client (/root/reference/src/client/client.c): feed it a
  * script file (or stdin) of operator lines, results go to stdout in the
  * reference's text formats (ids / values one per line, `(a,b,c)` tuples).
  *
  * Like the reference client, errors are per-line and non-fatal: a failed
  * op prints its DBE* message to stderr and the session continues
  * (client.c:88-104 renders RPC_ERROR and keeps going); the exit code is
  * 1 if any line failed. `--interactive` gives the reference's REPL mode
  * (client.c:237-262): a prompt, one op per line, same session throughout.
  *
  * Usage: Cli <dbDir> [scriptFile | --interactive]   (neither -> stdin)
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Cli <dbDir> [scriptFile | --interactive]")
      sys.exit(2)
    }
    val dbDir = args(0)
    val interactive = args.contains("--interactive") || args.contains("-i")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // results stream partition-at-a-time (Session.emit), so this cap
      // only needs to cover one partition, not the whole printed result
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("GRAFT_MAX_RESULT_SIZE", "1g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, dbDir)
    val session = engine.newSession()
    var failed = false

    def evalLine(line: String): Unit = {
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("#")) {
        Parser.parseLine(t) match {
          case Some(op) =>
            try session.eval(op).foreach(println)
            catch {
              case e: DbException =>
                failed = true; System.err.println(e.getMessage)
              case scala.util.control.NonFatal(e) =>
                // a stopped SparkContext is unrecoverable: every further
                // line would fail with the same misleading per-line code,
                // so terminate instead of looping on a dead session
                if (spark.sparkContext.isStopped) {
                  System.err.println(s"fatal: Spark session stopped: ${e.getMessage}")
                  sys.exit(1)
                }
                // other engine/Spark failures are per-line (the reference
                // renders RPC_ERROR and keeps the session, client.c:88-104)
                failed = true; System.err.println(s"DBEFILE: ${e.getMessage}")
            }
          case None =>
            failed = true; System.err.println(s"DBEPARSE: cannot parse: $t")
        }
      }
    }

    try {
      if (interactive) {
        print("graft> "); Console.flush()
        scala.io.Source.stdin.getLines().foreach { line =>
          evalLine(line)
          print("graft> "); Console.flush()
        }
        println()
      } else {
        val script =
          if (args.length > 1) new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(args(1))))
          else scala.io.Source.stdin.mkString
        script.linesIterator.foreach(evalLine)
      }
    } finally spark.stop()
    if (failed) sys.exit(1)
  }
}
