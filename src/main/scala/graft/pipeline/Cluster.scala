package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists — the step between
  * pair emission ([[Dedup.minhashNearDups]] and friends) and keeper
  * selection. Near-dup relations are not transitive (A~B and B~C do not
  * imply A~C passes the threshold), so "keep min doc per pair" under-drops:
  * the standard corpus-dedup contract is "one keeper per connected
  * component of the pair graph", and that needs a real component
  * computation.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — each round
  * is one self-union, one group-by, one join; the edge set contracts
  * toward star graphs rooted at each component's minimum id in
  * O(log n) rounds even on path graphs, where naive min-label propagation
  * needs O(diameter). Nothing ever materializes a component in one task:
  * per-round state is an edge list, partitioned by the hash shuffle.
  *
  * Scale notes (100 TB): the input is the near-dup PAIR list — orders of
  * magnitude smaller than the corpus. Rounds are driver-looped with an
  * aggregate-only convergence probe (a count + hash checksum, never a
  * collect of edges), and each round's result is checkpointed — local by
  * default, reliable via `checkpointDir` (see [[connectedComponents]]) —
  * to cut the growing lineage (per-round plans would otherwise nest,
  * re-running every prior round at each action).
  */
object Cluster {

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its neighborhood (including itself).
    * Keeps edges as (hi, lo) pairs; never drops connectivity.
    */
  private[pipeline] def largeStar(edges: DataFrame): DataFrame = {
    val sym = symmetric(edges)
    val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller-or-equal
    * neighbors (and itself) to the minimum among them.
    */
  private[pipeline] def smallStar(edges: DataFrame): DataFrame = {
    val lower = symmetric(edges).filter(col("v") < col("u"))
    val mins = lower.groupBy("u").agg(min(col("v")).as("m"))
    lower.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def symmetric(edges: DataFrame): DataFrame =
    edges.union(edges.select(col("v").as("u"), col("u").as("v")))

  /** Aggregate-only convergence probe: (edge count, order-independent
    * checksum). Two identical probes in a row mean the edge set is stable
    * (star graphs — small-star output pointing every member at its root).
    */
  private def probe(edges: DataFrame): (Long, Long) = {
    // bit_xor fold: order-independent and overflow-free under ANSI mode
    // (edges are distinct, so the xor is over a set, never a multiset)
    val r = edges
      .agg(count(lit(1)).as("n"),
        coalesce(call_function("bit_xor", xxhash64(col("u"), col("v"))),
          lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def normalized(pairs: DataFrame): DataFrame =
    pairs
      .select(col("da").cast("long").as("u"), col("db").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** ONE representative round's plan, UNEXECUTED and UNCONVERGED — for
    * plan audits only (`graft.tools.PlanAudit`): the real loop is
    * driver-iterated, so `explain()` on [[connectedComponents]] would
    * first run every round and then dump only the final checkpointed
    * projection. Never a substitute for the converged labeling.
    */
  def planOf(pairs: DataFrame): DataFrame =
    labelsOf(smallStar(largeStar(normalized(pairs))))

  /** Connected components of the undirected pair graph `pairs(da, db)`:
    * returns `(doc_id, cluster_id)` for every document appearing in a
    * pair, where `cluster_id` is the minimum doc id of its component
    * (the conventional keeper). Documents in no pair are their own
    * singleton components and are not emitted — callers union them back
    * if they want total coverage (they are the corpus minus one small
    * anti-join).
    *
    * Lineage is cut every half-round. By default with `localCheckpoint()`
    * (executor-local blocks: fast, but lost if an executor dies —
    * acceptable on local mode and short loops, where the recovery story
    * is "re-run the job"). Pass `checkpointDir` to use RELIABLE
    * checkpointing instead: each cut writes to that fault-tolerant path
    * (HDFS/object store) and survives executor loss — the right default
    * for a 1000-executor cluster, where some executor is statistically
    * certain to die during a multi-round contraction and a lost block
    * would otherwise fail the whole loop past recomputation (the lineage
    * behind a localCheckpoint is truncated, so Spark cannot rebuild it).
    * Cost: one distributed write + read per cut, and transiently up to
    * two edge-set snapshots on the store — Spark itself NEVER deletes
    * reliable checkpoints, so each cut deletes the snapshot IT
    * superseded (tracked by path from the checkpointed plan — never a
    * dir-wide "all but newest", which would race with concurrent
    * `df.checkpoint()` users of the same context) rather than leaving
    * ~2*rounds full edge sets behind. ONE snapshot (the converged star
    * state, output-sized) necessarily outlives the call because the
    * returned plan reads it; consume the result, then delete the
    * checkpoint subdirectory. `SparkContext.setCheckpointDir` is a
    * global pointer, so run one reliable-mode loop at a time per
    * context.
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
                          maxRounds: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val cut: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        // track the snapshot path each cut ITSELF created (read off the
        // checkpointed plan) and delete exactly the superseded own
        // snapshot — never "all but newest under the dir", which would
        // race with any concurrent df.checkpoint() from another thread
        // in the same context (the checkpoint dir is a global pointer,
        // so a stranger's snapshot can land next to ours mid-loop)
        var prevOwn: Option[String] = None
        df => {
          val out = df.checkpoint() // eager: materialized before pruning
          val own = checkpointFileOf(out)
          for (old <- prevOwn; nw <- own; if old != nw)
            deletePath(spark, old)
          if (own.isDefined) prevOwn = own
          out
        }
      case None => df => df.localCheckpoint()
    }
    var edges = cut(normalized(pairs))
    var last = probe(edges)
    // SIZE-GATED LOCAL SOLVE — the broadcast-join analogue for the
    // contraction: when the whole (deduplicated) edge set is at most
    // `graft.cluster.localSolveEdges` rows (default 200k — a few MB of
    // long pairs, far under any broadcast budget), finish with ONE
    // bounded driver collect + union-find instead of O(log n)
    // driver-looped rounds that each pay 2 checkpoints, ~6 exchanges
    // and a probe job regardless of size. The near-dup pair list is
    // orders of magnitude smaller than the corpus (scaladoc above), so
    // real deployments hit this gate for all but pathological dup
    // rates; past the gate the distributed contraction runs unchanged.
    // Identical output by construction — min-id component labels either
    // way (pinned in ClusterSpec against the distributed rounds).
    val localMax = spark.conf.getOption("graft.cluster.localSolveEdges")
      .flatMap(_.toLongOption).getOrElse(200000L)
    if (last._1 <= localMax) return localLabels(spark, edges)
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxRounds) {
      // cut between the half-rounds too: smallStar references its
      // input through a self-union and a group-by join, and each
      // reference would otherwise re-run the whole large-star join
      val next = cut(smallStar(cut(largeStar(edges))))
      val cur = probe(next)
      stable = cur == last
      last = cur
      edges = next
      rounds += 1
    }
    require(stable, s"connected components did not converge in $maxRounds " +
      "rounds — cycle in star contraction (should be impossible)")
    labelsOf(edges)
  }

  /** The reliable-checkpoint snapshot path a `df.checkpoint()` result
    * reads from: the checkpointed Dataset's plan is a `LogicalRDD` over
    * the internal RDD that was checkpointed, and that RDD knows its own
    * file. None for plans that aren't a reliable checkpoint (then the
    * loop simply skips pruning rather than guessing at paths).
    */
  private def checkpointFileOf(df: DataFrame): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.flatMap(_.getCheckpointFile)

  /** Delete ONE superseded snapshot this loop itself created. Safe
    * because the contraction is strictly sequential: once a cut has
    * materialized (checkpoint is eager), the previous own snapshot is
    * unreferenced by all future computation — only the newest is read by
    * the next half-round (and, after convergence, by the returned plan).
    */
  private def deletePath(spark: SparkSession, p: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }

  /** Converged small-star output is (member, root) stars; roots join as
    * their own members so every vertex of every non-trivial component
    * gets a row.
    */
  private def labelsOf(edges: DataFrame): DataFrame =
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()

  /** Driver union-find over a gate-bounded edge set: `(doc_id,
    * cluster_id = component min)` for every vertex in an edge — the
    * same labels the converged contraction emits. Path-halving find +
    * min-root union keeps the smaller id as every tree's root, so the
    * final root IS the component minimum.
    */
  private def localLabels(spark: SparkSession, edges: DataFrame): DataFrame = {
    val es = edges.select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    es.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u)
      val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent(rv) = ru else parent(ru) = rv
      }
    }
    // explicit schema, nullability matching the distributed path's
    // projection (nullable longs), so the two solves are plan-compatible
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.LongType)))
    val rows = parent.keys.toSeq.sorted
      .map(x => org.apache.spark.sql.Row(x, find(x)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
