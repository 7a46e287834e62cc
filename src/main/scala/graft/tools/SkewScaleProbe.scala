package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Measures what the explicit skew salt buys on a known-hot-key shuffle
  * join, and what Spark's own AQE skew split already covers — the
  * numbers behind SCALE.md's skew bullet, honestly separated.
  *
  * Workload: a fact side with 50% of its rows on ONE hot key (the
  * viral-document / default-value shape), equi-joined to a dim side
  * made deliberately un-broadcastable (120-byte payload per row, ~0.5
  * GB) so the join MUST shuffle — the regime the salt exists for. (With
  * a broadcastable dim, the right answer is the broadcast join and the
  * salt only blocks it: measured 0.5s unsalted-AQE vs 2.0s salted on
  * the first version of this probe.)
  *
  * Three timings per scale, identical result cardinality (asserted):
  *  - unsalted, AQE OFF — the naked failure mode: the hot key's whole
  *    M×N blowup on one task;
  *  - unsalted, AQE ON — Spark's runtime answer (skew-split of the
  *    oversized partition);
  *  - salted (8 buckets), AQE OFF — the explicit, planner-independent
  *    answer for pipelines that KNOW their hot key, and the only one of
  *    the three that also carries to engines/plans AQE cannot re-split
  *    (grouping and window keys — see Packing.keyedRank's salt).
  *
  * Usage: runMain graft.tools.SkewScaleProbe [rowsM ...]  (default 2 8)
  */
object SkewScaleProbe {
  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sizesM = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"rows_M"}%7s ${"pairs"}%12s ${"plain_noaqe_s"}%14s " +
      f"${"plain_aqe_s"}%12s ${"salted8_s"}%10s")
    for (m <- sizesM) {
      val n = m * 1000000L
      def large: DataFrame = spark.range(n).select(
        when(col("id") % 2 === 0, 0L)
          .otherwise(pmod(col("id"), lit(10000L))).as("k"),
        col("id").as("payload"))
      // 4M rows x ~120B payload: far over every broadcast threshold
      def small: DataFrame = spark.range(10000L * 400)
        .select(pmod(col("id"), lit(10000L)).as("k"),
          rpad(col("id").cast("string"), 120, "x").as("dim"))
      def run(salted: Boolean, aqe: Boolean): (Double, Long) = {
        var cnt = -1L
        val t = (1 to reps).map { _ =>
          spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
          try timeIt {
            cnt = (if (salted) SkewJoin.saltedInnerJoin(large, small, "k", 8)
                   else large.join(small, "k"))
              .agg(count(lit(1))).head().getLong(0)
          } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
        }.min
        (t, cnt)
      }
      val (tn, cn) = run(salted = false, aqe = false)
      val (ta, ca) = run(salted = false, aqe = true)
      val (ts, cs) = run(salted = true, aqe = false)
      require(cn == ca && ca == cs, s"variants disagree: $cn / $ca / $cs")
      println(f"$m%7d $cn%12d $tn%14.2f $ta%12.2f $ts%10.2f")
    }
    spark.stop()
  }
}
