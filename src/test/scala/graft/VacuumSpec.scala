package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.core.{DbException, Engine}

/** [[Engine.vacuum]] — reclaiming unreferenced copy-on-write version
  * dirs without ever touching anything a reader could still be pinned
  * to: the live catalog, every version any RETAINED catalog object
  * references (object mode), anything younger than the retention
  * grace. And the deposed-writer case: vacuum deletes are lease-fenced
  * exactly like catalog commits.
  */
class VacuumSpec extends SparkSpec {

  private def writeCsv(dir: String): String = {
    val p = Paths.get(dir, "in.csv")
    Files.write(p,
      java.util.Arrays.asList("va,vb", "1,10", "2,20", "3,30", "4,40"), UTF_8)
    p.toString
  }

  /** cols/<name>/v<k> dirs present on disk, as (name, k) pairs. */
  private def versionDirs(dbDir: String): Set[(String, Long)] =
    Option(new java.io.File(s"$dbDir/cols").listFiles())
      .getOrElse(Array.empty).toSeq
      .flatMap { c =>
        Option(c.listFiles()).getOrElse(Array.empty).toSeq
          .filter(f => f.isDirectory && f.getName.matches(raw"v\d+"))
          .map(f => c.getName -> f.getName.drop(1).toLong)
      }.toSet

  private def objectMode[A](ttlMs: Long = 60000, settleMs: Long = 5)(body: => A): A = {
    sys.props("graft.store.object") = "true"
    sys.props("graft.lease.ttl.ms") = ttlMs.toString
    sys.props("graft.lease.settle.ms") = settleMs.toString
    try body
    finally {
      sys.props.remove("graft.store.object")
      sys.props.remove("graft.lease.ttl.ms")
      sys.props.remove("graft.lease.settle.ms")
    }
  }

  test("local mode: churn is reclaimed, live state survives, sweep is idempotent") {
    val dir = tmpDir("vacuum_local")
    val dbDir = s"$dir/db"
    val csv = writeCsv(dir)
    val e = new Engine(spark, dbDir)
    try {
      e.execute(
        s"""create(va,"unsorted")
           |create(vb,"unsorted")
           |load("$csv")
           |u=select(vb,20)
           |update(u,vb,21)
           |d=select(va,4)
           |delete(d,va,vb)
           |""".stripMargin)
      // va: v1 load -> v2 delete; vb: v1 -> v2 update -> v3 delete
      assert(versionDirs(dbDir) == Set("va" -> 1L, "va" -> 2L,
        "vb" -> 1L, "vb" -> 2L, "vb" -> 3L))
      val st = e.vacuum(retainMs = 0L)
      assert(st.deleted == 3 && st.kept == 2 && st.reclaimedBytes > 0, st)
      assert(versionDirs(dbDir) == Set("va" -> 2L, "vb" -> 3L))
      // live data is intact and the engine still serves it
      val out = e.execute("s=select(va)\nv=fetch(vb,s)\nprint(v)")
      assert(out == Seq("10", "21", "30"), out)
      val again = e.vacuum(retainMs = 0L)
      assert(again.deleted == 0 && again.kept == 2, again)
    } finally e.close()
  }

  test("retention grace keeps young dirs even when unreferenced") {
    val dir = tmpDir("vacuum_grace")
    val dbDir = s"$dir/db"
    val csv = writeCsv(dir)
    val e = new Engine(spark, dbDir)
    try {
      e.execute(
        s"""create(va,"unsorted")
           |create(vb,"unsorted")
           |load("$csv")
           |u=select(vb,20)
           |update(u,vb,21)
           |""".stripMargin)
      val before = versionDirs(dbDir)
      val st = e.vacuum(retainMs = 3600 * 1000L)
      assert(st.deleted == 0 && versionDirs(dbDir) == before, st)
    } finally e.close()
  }

  test("the retention grace keys on FILE mtimes, not the dir entry " +
    "(S3A reports prefix-dir mtime as 0)") {
    val dir = tmpDir("vacuum_mtime")
    val dbDir = s"$dir/db"
    val csv = writeCsv(dir)
    val e = new Engine(spark, dbDir)
    try {
      e.execute(
        s"""create(va,"unsorted")
           |create(vb,"unsorted")
           |load("$csv")
           |u=select(vb,20)
           |update(u,vb,21)
           |""".stripMargin)
      // age vb/v1's FILES two hours into the past; the dir entry stays
      // fresh — a dir-mtime grace would keep it, the file-mtime rule
      // must reclaim it under a 1-hour retention
      val oldDir = new java.io.File(s"$dbDir/cols/vb/v1")
      val past = System.currentTimeMillis() - 2 * 3600 * 1000L
      oldDir.listFiles().foreach(f => assert(f.setLastModified(past)))
      assert(oldDir.setLastModified(System.currentTimeMillis()))
      val st = e.vacuum(retainMs = 3600 * 1000L)
      assert(st.deleted == 1 && !oldDir.exists(), st)
      // va/v1 (live) and vb/v2 (live) survive
      assert(versionDirs(dbDir) == Set("va" -> 1L, "vb" -> 2L))
    } finally e.close()
  }

  test("a crashed rewrite's orphan dir ABOVE the live version is garbage too") {
    val dir = tmpDir("vacuum_orphan")
    val dbDir = s"$dir/db"
    val csv = writeCsv(dir)
    val e = new Engine(spark, dbDir)
    try {
      e.execute(s"""create(va,"unsorted")
                   |create(vb,"unsorted")
                   |load("$csv")
                   |""".stripMargin)
      // a predecessor that died between its version write and the
      // catalog update: data at v2, catalog still at v1
      val orphan = new java.io.File(s"$dbDir/cols/va/v2")
      assert(orphan.mkdirs())
      Files.write(orphan.toPath.resolve("part-00000.parquet"),
        Array[Byte](1, 2, 3))
      val st = e.vacuum(retainMs = 0L)
      assert(st.deleted == 1 && !orphan.exists(), st)
      assert(versionDirs(dbDir) == Set("va" -> 1L, "vb" -> 1L))
    } finally e.close()
  }

  test("read-only engines refuse vacuum (DBEUNSUPPORTED)") {
    val dir = tmpDir("vacuum_ro")
    val dbDir = s"$dir/db"
    val w = new Engine(spark, dbDir)
    try w.execute("create(va,\"unsorted\")") finally w.close()
    val r = new Engine(spark, dbDir, readOnly = true)
    try {
      val e = intercept[DbException](r.vacuum(0L))
      assert(e.getMessage.contains("DBEUNSUPPORTED"), e.getMessage)
    } finally r.close()
  }

  test("object mode: versions referenced by RETAINED catalog history survive; " +
    "a pinned reader within the history still serves after vacuum") {
    objectMode() {
      val dir = tmpDir("vacuum_obj")
      val dbDir = s"$dir/db"
      val csv = writeCsv(dir)
      val e = new Engine(spark, dbDir)
      try {
        e.execute(
          s"""create(va,"unsorted")
             |create(vb,"unsorted")
             |load("$csv")
             |""".stripMargin)
        // pin a lock-free reader at the post-load snapshot (vb at v1)
        val reader = new Engine(spark, dbDir, readOnly = true)
        try {
          // two rewrites: vb v1 -> v2 -> v3; with < Keep commits the
          // whole history is retained, so v1 and v2 are both referenced
          // by retained catalog objects and must SURVIVE a zero-grace
          // vacuum even though the live catalog is at v3
          e.execute("u=select(vb,20)\nupdate(u,vb,21)")
          e.execute("u2=select(vb,21)\nupdate(u2,vb,22)")
          val st = e.vacuum(retainMs = 0L)
          assert(st.deleted == 0,
            s"retained-history versions must not be reclaimed: $st")
          assert(versionDirs(dbDir).contains("vb" -> 1L))
          // the pinned reader still serves its snapshot
          val out = reader.execute("s=select(va)\nv=fetch(vb,s)\nprint(v)")
          assert(out == Seq("10", "20", "30", "40"), out)
        } finally reader.close()
        // roll vb's early versions OUT of the retained history: the
        // catalog keeps 8 objects; enough further commits (cheap
        // creates — each is a catalog commit) age v1/v2 out of every
        // retained body, and only then are their dirs collectable
        (1 to 10).foreach(i => e.execute(s"""create(c$i,"unsorted")"""))
        val st2 = e.vacuum(retainMs = 0L)
        assert(st2.deleted == 2, s"v1/v2 now unreferenced: $st2")
        assert(versionDirs(dbDir).filter(_._1 == "vb") == Set("vb" -> 3L))
        val out = e.execute("s=select(va)\nv=fetch(vb,s)\nprint(v)")
        assert(out == Seq("10", "22", "30", "40"), out)
      } finally e.close()
    }
  }

  test("object mode: a deposed writer's vacuum fences instead of deleting") {
    objectMode() {
      val dir = tmpDir("vacuum_fence")
      val dbDir = s"$dir/db"
      val csv = writeCsv(dir)
      val io = new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)
      val e = new Engine(spark, dbDir)
      try {
        e.execute(
          s"""create(va,"unsorted")
             |create(vb,"unsorted")
             |load("$csv")
             |u=select(va,1)
             |update(u,va,9)
             |""".stripMargin)
        // roll va v1 out of the retained catalog history so it is
        // genuinely ELIGIBLE — the fence must fire at the delete
        // attempt, not be masked by an empty sweep
        (1 to 10).foreach(i => e.execute(s"""create(c$i,"unsorted")"""))
        val before = versionDirs(dbDir)
        assert(before.size == 3)
        // a successor takes the lease out from under e (what TTL expiry
        // during a long pause looks like from the deposed side)
        io.write(s"$dbDir/_lease",
          s"99\tusurper\t${System.currentTimeMillis()}\n")
        val fenced = intercept[DbException](e.vacuum(retainMs = 0L))
        assert(fenced.getMessage.contains("DBELOCKED"), fenced.getMessage)
        // nothing was deleted: the fence fired before the first delete
        assert(versionDirs(dbDir) == before)
      } finally e.close()
    }
  }
}
