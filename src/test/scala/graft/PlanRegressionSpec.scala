package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.queries.{AnalyticsQueries, PipelineQueries}
import graft.operators.ColumnOps
import graft.lang.Op.{HashJoin, JoinType, SortJoin, TreeJoin}

/** Plan-regression assertions for the flagship driver queries: the scale
  * claims the plan audits verify by hand each round (shuffle-keyed joins,
  * no shuffle-based cartesian products, scan fusion, bucketed
  * exchange-free joins, explicit join-strategy hints honored) pinned as
  * tests so they survive Spark upgrades and refactors.
  *
  * Scope notes:
  * - The sweep covers the pipeline/analytics surfaces built straight from
  *   [[graft.queries.Tables]]. Engine-backed parity queries (create/load/
  *   select/... over the CSV store) are exercised plan-and-result in
  *   EngineSpec; their join strategies are pinned here directly at the
  *   [[ColumnOps.join]] level without spinning up an engine store.
  * - Queries whose production form is driver-iterated use the same
  *   [[PipelineQueries.planOnlyQueries]] substitutes as the PlanAudit
  *   tool (one representative round).
  * - `BroadcastNestedLoopJoin` is LEGITIMATE where one side is a provably
  *   tiny broadcast (hyperplane/centroid tables, singleton aggregates,
  *   brute-force query sets) — those queries are asserted cartesian-free
  *   only, while the equi-join family must not contain ANY nested-loop
  *   or cartesian node.
  */
class PlanRegressionSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  // recall gates materialize eagerly at construction (cache hygiene);
  // under this flag they return their real plan unrun — same plan, just
  // not executed (the PlanAudit tool sets the same flag)
  override def beforeAll(): Unit = { sys.props("graft.plan.only") = "true" }
  override def afterAll(): Unit = { sys.props -= "graft.plan.only" }

  private def initialPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def planString(name: String): String = {
    val q = PipelineQueries.planOnlyQueries.getOrElse(name,
      (PipelineQueries.queries ++ AnalyticsQueries.queries)(name))
    initialPlan(q(spark, sf)).toString
  }

  /** Every equi-join driver query: a lost join key or a non-equi
    * condition would silently degrade to a nested-loop/cartesian — the
    * scale-killer regression class. None of these may contain either
    * node in any form.
    */
  private val equiJoinQueries = Seq(
    "join_asof", "join_asof_sharded", "join_range", "layout_bucketed_join",
    "dedup_exact", "dedup_exact_hash", "dedup_minhash", "dedup_ngram",
    "dedup_simhash", "dedup_substring", "dedup_spans", "dedup_spans_apply",
    "dedup_clusters",
    "text_contamination", "text_winnow", "text_vocab",
    "events_window", "events_time_window", "events_sessionize",
    "text_bpe_merges", "shard_pack", "corpus_shuffle", "corpus_resample",
    "text_chunks", "dedup_incremental", "dedup_incremental_near",
    "dedup_spans_longest", "corpus_deciles", "corpus_split",
    "text_rarity",
    // the attribute filter is exactly what makes filtered ANN equi-join-
    // able — a regression here would silently fall back to nested-loop
    "ann_filtered")
  // (text_tfidf broadcasts its singleton corpus-total for IDF — the
  // legitimate BNLJ shape — so it lives in the cartesian-free sweep only)

  test("equi-join family plans contain no nested-loop or cartesian join") {
    for (name <- equiJoinQueries) {
      val plan = planString(name)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name degraded to BroadcastNestedLoopJoin:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name degraded to CartesianProduct:\n$plan")
    }
  }

  test("no driver query anywhere uses a shuffle-based cartesian product") {
    // broadcast-crossJoin queries (ANN brute force, centroid/hyperplane
    // tables, singleton stat rows) legitimately plan BroadcastNestedLoop
    // with a KB-sized build side; a CartesianProduct (both sides
    // partitioned, no broadcast) is never acceptable in ANY driver plan
    val all = (PipelineQueries.queries ++ AnalyticsQueries.queries).keys
    for (name <- all) {
      val plan = planString(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a shuffle-based cartesian:\n$plan")
    }
  }

  test("pipeline_prep fuses to one corpus scan") {
    val plan = planString("pipeline_prep")
    val scans = "FileScan|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
    // per-row prep exprs ride the scan projection; the only exchanges are
    // the dedup group-by and the singleton-stat aggregate
    val shuffles = "Exchange (?:hash|range|Single)".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles:\n$plan")
  }

  test("corpus sink admission probe plans with NO shuffle, every arm") {
    // the sink probe's scale contract: whatever the fp store's size,
    // the admission join never shuffles — broadcast ANTI of the store
    // while small, the batch's key set PUSHED into the store scan as
    // point predicates beyond (broadcast ANTI of the bounded hits), a
    // broadcast SEMI + ANTI only for an oversized batch. A regression
    // to a sort-merge/shuffled-hash anti join here is the exact
    // O(corpus)-per-batch shape the fingerprint side table replaced.
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.{unhex, md5, col}
    val dir = tmpDir("plan-admission")
    (1L to 1000L).map(i => s"other $i").toDF("text")
      .select(unhex(md5(col("text").cast("binary"))).as("fpb"))
      .coalesce(1).sortWithinPartitions("fpb")
      .write.parquet(s"$dir/fp/batch_id=0")
    val batch = (1L to 100L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
      .withColumn("fp", md5(col("text").cast("binary")))
    def arm(fpBytes: Long, conf: (String, String)*) = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try graft.streaming.DocStreams.admissionJoin(
        batch, s"$dir/fp", 99L, fpBytes)
      finally conf.foreach { case (k, _) => spark.conf.unset(k) }
    }
    val big = Long.MaxValue / 2
    val arms = Seq(arm(0L), arm(big),
      arm(big, "graft.sink.fpPushdownKeys" -> "0"))
    assert(arms.map(_._2) == Seq("broadcast_anti", "pushdown", "scan_semi"))
    for ((df, name) <- arms) {
      val plan = initialPlan(df).toString
      val shuffles = "Exchange (?:hash|range|Single)".r.findAllIn(plan).size
      assert(shuffles == 0, s"$name arm shuffles ($shuffles):\n$plan")
      assert(plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoop"),
        s"$name arm lost its broadcast hash join:\n$plan")
    }
    // the pushdown arm's point predicates must REACH the store scan —
    // visible as a pushed In on fpb in the scan node, with the 100-key
    // batch split across ceil(100/chunk) unioned chunk scans
    val pushPlan = initialPlan(arms(1)._1).toString
    assert("PushedFilters: \\[.*In\\(fpb".r.findFirstIn(pushPlan).isDefined,
      s"pushdown arm lost its pushed In(fpb...):\n$pushPlan")
    // the waved variant (batch above the per-wave bound) runs its
    // probes eagerly and leaves only a shuffle-free final plan
    val (wDf, wArm) = arm(big, "graft.sink.fpPushdownKeys" -> "10")
    assert(wArm == "pushdown_waves", wArm)
    val wPlan = initialPlan(wDf).toString
    assert("Exchange (?:hash|range|Single)".r.findAllIn(wPlan).isEmpty,
      s"waved arm shuffles:\n$wPlan")
  }

  test("layout_bucketed_join joins bucketed tables with no join shuffle") {
    // the post-join groupBy(custkey) legitimately shuffles ONCE; broken
    // bucketing would add two more hashpartitioning exchanges feeding the
    // join itself
    val plan = planString("layout_bucketed_join")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"bucketed join re-shuffled ($shuffles):\n$plan")
  }

  test("corpus_deciles windows the corpus keyed; single-partition only for counts") {
    val plan = planString("corpus_deciles")
    // the corpus-side row_number must be partitioned by the key …
    assert(plan.contains("Exchange hashpartitioning(n_chars"),
      s"corpus window lost its key partitioning:\n$plan")
    // … and the only single-partition exchange is the cardinality-sized
    // counts/offsets window — a second one would mean the corpus itself
    // collapsed into one task (the trap keyedRank exists to avoid)
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1, s"corpus-sized single-partition window:\n$plan")
  }

  test("ColumnOps join keywords map to their hinted physical strategies") {
    val spark0 = spark
    import spark0.implicits._
    val l = (1 to 5000).map(i => (i.toLong, i % 97)).toDF("id", "v")
    val r = (1 to 1000).map(i => (i.toLong, i % 97)).toDF("id", "v")
    def planOf(jt: JoinType) =
      initialPlan(ColumnOps.join(jt, l, r, Nil, Nil)._1).toString
    assert(planOf(HashJoin).contains("ShuffledHashJoin"), planOf(HashJoin))
    assert(planOf(SortJoin).contains("SortMergeJoin"), planOf(SortJoin))
    assert(planOf(TreeJoin).contains("BroadcastHashJoin"), planOf(TreeJoin))
  }
}
