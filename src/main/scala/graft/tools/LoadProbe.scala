package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.core.Engine

/** Decompose the load floor: the canonical create+load of the baseline
  * workload (PerfBaseline's r.csv/s.csv shapes), phase-timed — CSV
  * scan+ordinal assignment+cache, per-column parquet writes, catalog
  * commits — so the small-scale baseline's fixed cost is measured, not
  * guessed. Usage: runMain graft.tools.LoadProbe [nR, default 100000].
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val nR = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm
    {
      val w = Files.createTempDirectory("graft_lp_warm").toString
      val (r, s) = PerfBaseline.genCsvs(w, 1000, 1000)
      val e = new Engine(spark, s"$w/db")
      e.execute(s"""create(ra,"unsorted")
                   |create(rc,"b+tree")
                   |create(rd,"unsorted")
                   |create(sa,"b+tree")
                   |create(sf,"b+tree")
                   |create(sg,"unsorted")
                   |load("$r")
                   |load("$s")
                   |""".stripMargin)
      e.close()
    }

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }

    // A/B mode: coalesce(1) fast path vs two-phase split offsets on the
    // SAME workload, arm order alternating per rep (a fixed order rides
    // the first arm's page-cache/JIT warmth), with an untouched control
    // measuring window noise. Usage: SPARK_GRAFT_LOAD_AB=1 ... LoadProbe 600000
    if (sys.env.get("SPARK_GRAFT_LOAD_AB").contains("1")) {
      def fullLoad(): Double = {
        val dir = Files.createTempDirectory(s"graft_ab_$nR").toString
        val (r, _) = PerfBaseline.genCsvs(dir, nR, 1000)
        val e = new Engine(spark, s"$dir/db")
        e.execute("create(ra,\"unsorted\")\ncreate(rc,\"b+tree\")\ncreate(rd,\"unsorted\")")
        val t0 = System.nanoTime()
        e.execute(s"""load("$r")""")
        val dt = (System.nanoTime() - t0) / 1e9
        e.close(); dt
      }
      def control(): Double = {
        val t0 = System.nanoTime()
        spark.range(8L << 20).selectExpr("sum(id)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      val arms = Seq(
        "coalesce" -> (() => spark.conf.set("graft.load.coalesceBytes", (64L << 20).toString)),
        "twophase" -> (() => spark.conf.set("graft.load.coalesceBytes", "0")))
      for (rep <- 1 to 6) {
        val order = if (rep % 2 == 1) arms else arms.reverse
        val parts = order.map { case (name, set) =>
          set(); f"$name=${fullLoad()}%.3f" } :+ f"control=${control()}%.3f"
        println(s"  rep $rep: ${parts.mkString("  ")}")
      }
      spark.conf.unset("graft.load.coalesceBytes")
      spark.stop(); return
    }

    for (rep <- 1 to 3) {
      println(s"=== rep $rep, nR=$nR ===")
      val dir = Files.createTempDirectory(s"graft_lp_$nR").toString
      val (r, _) = PerfBaseline.genCsvs(dir, nR, 10000)
      // sub-phases of parseCsv, separately
      locally {
        import org.apache.spark.sql.functions.{coalesce, col, lit}
        import org.apache.spark.sql.types._
        import org.apache.spark.sql.Row
        val raw = t("csv plan (header read)") {
          spark.read.option("header", "true").csv(r)
        }
        t("csv full scan (count only)") { raw.count() }
        val names = raw.columns.toSeq
        val casted = raw.select(
          names.map(n => coalesce(col(n).cast(IntegerType), lit(0)).as(n)): _*)
        val schema = StructType(
          StructField("ord", LongType, nullable = false) +:
            names.map(n => StructField(n, IntegerType, nullable = true)))
        val zipped = t("rdd zip+cache+count") {
          val d = spark.createDataFrame(
            casted.rdd.zipWithIndex().map { case (row, i) =>
              Row.fromSeq(i +: row.toSeq) }, schema).cache()
          d.count(); d
        }
        zipped.unpersist(false)
        // new-path sub-phases
        import org.apache.spark.sql.functions.{broadcast, monotonically_increasing_id, shiftrightunsigned}
        import spark.implicits._
        val counts = t("toRdd split counts") {
          casted.queryExecution.toRdd
            .mapPartitionsWithIndex((i, it) => Iterator((i.toLong, it.size.toLong)))
            .collect().sortBy(_._1)
        }
        t("pruned split counts") {
          raw.select().queryExecution.toRdd
            .mapPartitionsWithIndex((i, it) => Iterator((i.toLong, it.size.toLong)))
            .collect().sortBy(_._1)
        }
        var acc = 0L
        val offsets = counts.map { case (s, c) => val o = acc; acc += c; (s, o) }
        val offsetsDf = broadcast(offsets.toSeq.toDF("__graft_split", "__graft_off"))
        val mid = monotonically_increasing_id()
        val withOrd = casted
          .withColumn("__graft_split", shiftrightunsigned(mid, 33))
          .withColumn("__graft_local", mid.bitwiseAND(lit((1L << 33) - 1)))
          .join(offsetsDf, "__graft_split")
          .select((col("__graft_off") + col("__graft_local")).as("ord") +:
            names.map(col): _*)
        t("ord plan, no cache (count)") { withOrd.count() }
        val cached = withOrd.cache()
        t("ord plan cache+count") { cached.count() }
        cached.unpersist(false)
      }
      // phase-timed replica of Storage.parseCsv + Session.evalLoad
      val parsed = t("parseCsv (plan+cache handle)") {
        graft.core.Storage.parseCsv(spark, r)
      }
      t("3 column writes (concurrent)") {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val futs = parsed.cols.map { case (name, df) =>
          Future {
            val data = df.select(
              org.apache.spark.sql.functions.col("ord").as("id"),
              org.apache.spark.sql.functions.col("v"))
            val st = if (name == "rc")
              graft.lang.Op.BTree else graft.lang.Op.Unsorted
            graft.core.Storage.writeColumn(data, s"$dir/out/$name",
              st, rowsHint = Some(parsed.rowsUpperBound))
          }
        }
        futs.foreach(Await.result(_, Duration.Inf))
      }
      t("exact rows (post-write)") {
        parsed.exactRows.getOrElse(
          graft.core.Storage.parquetRowCount(spark, s"$dir/out/ra"))
      }
      parsed.scan.unpersist(false)
      // the full engine path for comparison
      val e = new Engine(spark, s"$dir/db")
      t("engine create x3 (catalog)") {
        e.execute(s"""create(ra,"unsorted")
                     |create(rc,"b+tree")
                     |create(rd,"unsorted")
                     |""".stripMargin)
      }
      t("engine load (full)") { e.execute(s"""load("$r")""") }
      e.close()
    }
    spark.stop()
  }
}
