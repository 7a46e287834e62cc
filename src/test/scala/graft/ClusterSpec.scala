package graft

import org.apache.spark.sql.functions.col
import graft.pipeline.Cluster

/** Connected components over pair lists (Cluster.connectedComponents):
  * the star-contraction loop checked against a brute-force union-find on
  * graphs chosen to stress it — transitivity chains (where min-per-pair
  * keeper selection is wrong), long paths (where propagation needs many
  * rounds but contraction needs few), and seeded random graphs.
  */
class ClusterSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // label = component min: union-by-min keeps the root minimal
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Cluster.connectedComponents(spark, edges.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive chain collapses to one cluster rooted at the min") {
    // A~B, B~C, C~D but never A~D directly: pair-local keeper selection
    // (min per pair) would keep both 1 and 3; components keep only 1
    val got = run(Seq((3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("path graph of 64 nodes converges to a single star") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("separate components keep separate minima, singleton-free output") {
    val got = run(Seq((10L, 20L), (30L, 40L), (40L, 50L)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 30L))
  }

  test("empty pair list yields empty labeling") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(Cluster.connectedComponents(spark, empty).count() == 0)
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(n, edges), s"trial $trial")
    }
  }

  test("size-gated local solve equals the distributed contraction on seeded random graphs") {
    // the default gate (200k edges) routes small inputs to the driver
    // union-find; forcing the gate to 0 runs the star-contraction loop —
    // both must emit the identical (doc_id, component-min) labeling
    val rnd = new scala.util.Random(20211)
    val edges = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val viaLocal = run(edges)
    val key = "graft.cluster.localSolveEdges"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    val viaDistributed =
      try run(edges)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    assert(viaLocal == viaDistributed)
    assert(viaLocal == unionFind(120, edges))
  }

  test("reliable-checkpoint mode produces the identical labeling and writes to the dir") {
    import spark.implicits._
    val dir = tmpDir("cluster_ckpt")
    val edges = ((0L until 31L).map(i => (i, i + 1)) ++ Seq((40L, 41L)))
      .toDF("da", "db")
    val got = Cluster
      .connectedComponents(spark, edges, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L to 31L).map(_ -> 0L).toMap ++ Map(40L -> 40L, 41L -> 40L)
    assert(got == expect)
    // the cuts really went through the fault-tolerant path, not
    // executor-local blocks...
    def rddDirs(p: java.io.File): Seq[java.io.File] = {
      val kids = Option(p.listFiles).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(f => f.isDirectory && f.getName.startsWith("rdd-")) ++
        kids.filter(_.isDirectory).flatMap(rddDirs)
    }
    val remaining = rddDirs(new java.io.File(dir))
    assert(remaining.nonEmpty, s"no checkpoint snapshots under $dir")
    // ...and the superseded snapshots were pruned as the loop advanced:
    // a multi-round path graph writes many cuts, but only the final
    // (output-referenced) one may outlive the call
    assert(remaining.size == 1,
      s"expected 1 surviving snapshot, got ${remaining.map(_.getName)}")
  }

  test("planOf is a single unconverged round — audit-only, never the real labeling") {
    import spark.implicits._
    // a path graph needs multiple rounds; one round must NOT equal the
    // converged components (guards against planOf quietly becoming a
    // substitute for connectedComponents)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("da", "db")
    val one = Cluster.planOf(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val converged = (0L to 63L).map(_ -> 0L).toMap
    assert(one != converged)
  }

  test("duplicate and reversed input edges do not change the labeling") {
    val base = Seq((1L, 2L), (2L, 3L))
    val noisy = base ++ base.map(_.swap) ++ base
    assert(run(noisy) == run(base))
  }

  test("chained near-dups: components drop what pair-local keeping retains") {
    import spark.implicits._
    // Sliding 30-token windows over a 44-token stream, step 7: adjacent
    // windows share 21 of 35 distinct trigrams (J = 0.6 >= 1/2), the two
    // ends share only 14 of 42 (J = 1/3 < 1/2) — B bridges A and C.
    // Pair-local min-keeping sees pairs (A,B) and (B,C), drops B twice,
    // and KEEPS C; the component keeps only A.
    def window(from: Int): String = (from until from + 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, window(1)), (2L, window(8)), (3L, window(15)),
      (4L, (100 to 140).map(i => s"z$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup
      .ngramJaccardPairs(docs, n = 3, tnum = 1, tden = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"bridge premise broke: $pairs")
    val labels = run(pairs.toSeq)
    val survivors = Set(1L, 2L, 3L, 4L) --
      labels.collect { case (d, cid) if d != cid => d }
    assert(survivors == Set(1L, 4L))
  }
}
