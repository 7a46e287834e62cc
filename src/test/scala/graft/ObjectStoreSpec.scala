package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.core.{DbException, Engine}

/** The object-store (rename-less) store protocol end-to-end: the Engine
  * forced into object mode (`graft.store.object`) over a local path —
  * the same HadoopStoreIO / WriterLease / VersionedCatalogStore code
  * path an s3a:// dbDir takes, with Hadoop's LocalFileSystem supplying
  * the store. Nothing here may depend on atomic rename: the catalog is
  * versioned immutable objects, the writer lock is a TTL'd lease, and
  * every stale-writer scenario must lose by EPOCH ordering, not by
  * filesystem luck.
  */
class ObjectStoreSpec extends SparkSpec {

  /** Run `body` in object mode with test-speed lease timings. */
  private def objectMode[A](ttlMs: Long = 60000, settleMs: Long = 10)(body: => A): A = {
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

  private def writeCsv(dir: String): String = {
    val p = Paths.get(dir, "in.csv")
    Files.write(p, java.util.Arrays.asList("oa,ob", "1,10", "2,20", "3,30"), UTF_8)
    p.toString
  }

  /** Lease manipulation through the SAME store API the engine uses —
    * raw java.nio writes would leave LocalFileSystem's stale .crc
    * sidecars behind and fail checksum on the engine's next read.
    */
  private def putLease(dbDir: String, body: String): Unit =
    new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)
      .write(s"$dbDir/_lease", body)

  private def readLease(dbDir: String): Array[String] =
    new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)
      .read(s"$dbDir/_lease").get.trim.split("\t")

  private def catalogObjects(dbDir: String): Seq[String] = {
    val d = new java.io.File(s"$dbDir/catalog")
    if (!d.exists()) Seq.empty
    // LocalFileSystem is a ChecksumFileSystem: ignore its .crc sidecars
    // (real object stores don't produce them; the engine's own list()
    // regex-filters names anyway)
    else d.listFiles().map(_.getName).filterNot(_.startsWith(".")).toSeq.sorted
  }

  test("object mode round-trips create/load/query/insert with a versioned catalog, no catalog.txt") {
    objectMode() {
      val dir = tmpDir("objstore_rt")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      try {
        val out = e1.execute(
          s"""create(oa,"unsorted")
             |create(ob,"sorted")
             |load("$csv")
             |p=select(ob,15,35)
             |v=fetch(oa,p)
             |print(v)
             |insert(oa,9,ob,40)
             |""".stripMargin)
        assert(out == Seq("2", "3"))
      } finally e1.close()
      // the catalog is versioned objects under catalog/, never a
      // rename-committed catalog.txt
      assert(!Files.exists(Paths.get(dbDir, "catalog.txt")))
      val objs = catalogObjects(dbDir)
      assert(objs.nonEmpty && objs.forall(_.matches(raw"c\d{20}-e\d{10}\.txt")), objs)
      // reopen: a fresh engine (new lease epoch, takeover barrier) sees
      // the committed state, including the insert
      val e2 = new Engine(spark, dbDir)
      try assert(e2.execute("q=select(ob,40,40)\nw=fetch(oa,q)\nprint(w)") == Seq("9"))
      finally e2.close()
    }
  }

  test("a torn (markerless) catalog object is ignored; the last committed state stays live") {
    objectMode() {
      val dir = tmpDir("objstore_torn")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      try e1.execute(s"""create(oa,"unsorted")
                        |create(ob,"unsorted")
                        |load("$csv")
                        |""".stripMargin)
      finally e1.close()
      // simulate a writer dying mid-PUT on a progressively-visible
      // store: a HIGHER-seq, higher-epoch object with no #commit marker
      Files.writeString(Paths.get(dbDir, "catalog",
        f"c${99999L}%020d-e${99L}%010d.txt"),
        "oa\tunsorted\t77\t77\t1\t1\t77\n") // no marker: torn
      val e2 = new Engine(spark, dbDir)
      try {
        val out = e2.execute("s=select(oa,1,3)\nprint(s)")
        assert(out == Seq("0", "1", "2")) // real data, not the torn fake
      } finally e2.close()
    }
  }

  test("a stale-epoch commit can never win: epoch orders strictly before seq") {
    objectMode() {
      val dir = tmpDir("objstore_stale")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      try e1.execute(s"""create(oa,"unsorted")
                        |create(ob,"unsorted")
                        |load("$csv")
                        |""".stripMargin)
      finally e1.close()
      // a deposed writer (epoch 0 — below any real lease epoch) lands a
      // committed object with an enormous seq AFTER the real commits
      Files.writeString(Paths.get(dbDir, "catalog",
        f"c${99999L}%020d-e${0L}%010d.txt"),
        "oa\tunsorted\t77\t77\t1\t1\t77\n#commit\n")
      val e2 = new Engine(spark, dbDir)
      try {
        val out = e2.execute("s=select(oa,1,3)\nprint(s)")
        assert(out == Seq("0", "1", "2")) // the stale commit lost
      } finally e2.close()
    }
  }

  test("a live lease blocks a second writer; an expired lease is taken over with a higher epoch") {
    objectMode(ttlMs = 60000) {
      val dir = tmpDir("objstore_lease")
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      e1.execute("create(oa,\"unsorted\")")
      e1.close()
      // cross-process simulation: another owner's lease, heartbeat fresh
      putLease(dbDir, s"5\tother-owner\t${System.currentTimeMillis()}\n")
      val denied = intercept[DbException](new Engine(spark, dbDir))
      assert(denied.getMessage.contains("DBELOCKED"), denied.getMessage)
      // same lease, heartbeat far in the past: expired -> takeover
      putLease(dbDir, s"5\tother-owner\t${System.currentTimeMillis() - 3600000L}\n")
      val e2 = new Engine(spark, dbDir)
      try {
        // takeover bumped the epoch past the dead writer's
        val lease = readLease(dbDir)
        assert(lease(0).toLong == 6L, lease.mkString(","))
        assert(lease(1) != "other-owner")
        e2.execute("create(ob,\"unsorted\")") // and the store still works
      } finally e2.close()
    }
  }

  test("a deposed writer is fenced: its next catalog commit throws, it cannot corrupt") {
    objectMode(ttlMs = 60000) {
      val dir = tmpDir("objstore_fence")
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      try {
        e1.execute("create(oa,\"unsorted\")")
        // a successor takes the lease out from under e1 (higher epoch,
        // different owner — what a TTL expiry during a long GC pause
        // looks like from the deposed side)
        putLease(dbDir, s"99\tusurper\t${System.currentTimeMillis()}\n")
        val fenced = intercept[DbException](e1.execute("create(ob,\"unsorted\")"))
        assert(fenced.getMessage.contains("DBELOCKED"), fenced.getMessage)
        // and the fence is sticky: reads of the catalog map still work,
        // but every further commit attempt stays dead
        val again = intercept[DbException](e1.execute("create(oc,\"unsorted\")"))
        assert(again.getMessage.contains("DBELOCKED"), again.getMessage)
      } finally e1.close()
      // the usurper's lease object survives e1's close (release must
      // never delete a lease it no longer owns)
      val lease = readLease(dbDir)
      assert(lease(1) == "usurper", lease.mkString(","))
    }
  }

  test("object-mode engine behind TcpServer: client-streamed load spools OUTSIDE the store") {
    objectMode() {
      val dir = tmpDir("objstore_tcp")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val engine = new Engine(spark, dbDir)
      val server = new graft.server.TcpServer(engine)
      val port = server.start()
      try {
        val out = collection.mutable.Buffer[String]()
        val failed = graft.server.NetClient.run("127.0.0.1", port,
          s"""create(oa,"unsorted")
             |create(ob,"unsorted")
             |load("$csv")
             |p=select(ob,20)
             |v=fetch(oa,p)
             |print(v)
             |""".stripMargin.linesIterator,
          out += _, e => throw new IllegalStateException(s"server error: $e"))
        assert(!failed)
        assert(out.toSeq == Seq("2"))
        // remote-store contract: the CSV spool must land in the JVM
        // temp dir (engine.spoolDir), never as objects under the store
        assert(engine.spoolDir ==
          Paths.get(System.getProperty("java.io.tmpdir")))
        val leftovers = Option(new java.io.File(dbDir).listFiles())
          .getOrElse(Array.empty).filter(_.getName.endsWith(".csv.tmp"))
        assert(leftovers.isEmpty, leftovers.mkString(","))
      } finally { server.close(); engine.close() }
    }
  }

  test("epoch survives a clean close: successors always claim strictly higher epochs") {
    objectMode() {
      val dbDir = s"${tmpDir("objstore_epoch")}/db"
      val e1 = new Engine(spark, dbDir)
      e1.execute("create(oa,\"unsorted\")"); e1.close()
      // clean close TOMBSTONES the lease: epoch preserved, heartbeat 0
      val l1 = readLease(dbDir)
      assert(l1(0).toLong == 1L && l1(2) == "0", l1.mkString(","))
      val e2 = new Engine(spark, dbDir)
      e2.execute("create(ob,\"unsorted\")"); e2.close()
      val l2 = readLease(dbDir)
      // had the close DELETED the lease, e2 would have claimed epoch 1
      // again and its commits would sort below nothing — later writers
      // could resurrect pre-e2 state. Tombstoning forces 2.
      assert(l2(0).toLong == 2L && l2(2) == "0", l2.mkString(","))
      val e3 = new Engine(spark, dbDir)
      try assert(e3.catalog.all.map(_.name).toSet == Set("oa", "ob"))
      finally e3.close()
    }
  }

  test("a torn (unparseable) lease object cannot lock the store out; catalog floors the epoch") {
    objectMode() {
      val dbDir = s"${tmpDir("objstore_tornlease")}/db"
      val e1 = new Engine(spark, dbDir)
      e1.execute("create(oa,\"unsorted\")"); e1.close() // commits at epoch 1
      // simulate a claimant crashing mid-PUT: garbage where the lease goes
      putLease(dbDir, "garb")
      val e2 = new Engine(spark, dbDir) // must not be locked out forever
      try {
        assert(e2.catalog.all.map(_.name) == Seq("oa"))
        // the torn lease's epoch was unknowable, but the CATALOG history
        // (epoch-1 objects) floors the claim: e2 must be at epoch >= 2
        val l = readLease(dbDir)
        assert(l(0).toLong >= 2L, l.mkString(","))
        e2.execute("create(ob,\"unsorted\")") // and commits still land
      } finally e2.close()
    }
  }

  test("createExclusive claims once: second claimant loses without writing") {
    val dir = tmpDir("objstore_excl")
    val io = new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)
    assert(io.createExclusive(s"$dir/_lease", "1\ta\t0\n"))
    assert(!io.createExclusive(s"$dir/_lease", "1\tb\t0\n"))
    // loser wrote nothing: the winner's body is intact
    assert(io.read(s"$dir/_lease").contains("1\ta\t0\n"))
  }

  test("read-only engines open concurrently, lock-free, alongside a live writer (object mode)") {
    objectMode() {
      val dir = tmpDir("objstore_ro")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val writer = new Engine(spark, dbDir)
      try {
        writer.execute(s"""create(oa,"unsorted")
                          |create(ob,"unsorted")
                          |load("$csv")
                          |""".stripMargin)
        // TWO readers at once, while the WRITER still holds the lease —
        // no lock, no lease, no DBELOCKED
        val r1 = new Engine(spark, dbDir, readOnly = true)
        val r2 = new Engine(spark, dbDir, readOnly = true)
        try {
          assert(r1.execute("s=select(oa,2)\nprint(s)") == Seq("1"))
          assert(r2.execute("v=select(ob,30)\nw=fetch(oa,v)\nprint(w)") == Seq("3"))
          // snapshot semantics: the writer commits MORE data; open
          // readers keep their snapshot, a fresh reader sees the commit
          writer.execute("insert(oa,9,ob,40)")
          assert(r1.execute("t=select(ob,40)\nu=fetch(oa,t)\nprint(u)") == Seq())
          val r3 = new Engine(spark, dbDir, readOnly = true)
          try assert(r3.execute("t=select(ob,40)\nu=fetch(oa,t)\nprint(u)") == Seq("9"))
          finally r3.close()
          // mutation through a reader fails loudly, reader survives
          val denied = intercept[DbException](r1.execute("insert(oa,1,ob,1)"))
          assert(denied.getMessage.contains("DBEUNSUPPORTED"), denied.getMessage)
          // and fails BEFORE touching anything: the denial must write
          // zero bytes into the shared store (no appended parquet in
          // the live dirs, no phantom state in the reader's catalog —
          // a commit-seam-only check would have appended an orphan row
          // with the writer's next id first)
          val denied2 = intercept[DbException](r1.execute("create(oc,\"unsorted\")"))
          assert(denied2.getMessage.contains("DBEUNSUPPORTED"), denied2.getMessage)
          val noPhantom = intercept[DbException](r1.execute("s=select(oc)"))
          assert(noPhantom.getMessage.contains("DBECOLSELECT"), noPhantom.getMessage)
          // the WRITER's view is untouched by the denied mutations: the
          // row count it commits next is exactly its own data's
          writer.execute("insert(oa,77,ob,50)")
          assert(writer.execute("q=select(oa)\nw=fetch(oa,q)\nprint(w)")
            == Seq("1", "2", "3", "9", "77"))
        } finally { r1.close(); r2.close() }
      } finally writer.close()
    }
  }

  test("read-only engine works in LOCAL mode too, alongside the file-locked writer") {
    val dir = tmpDir("local_ro")
    val csv = writeCsv(dir)
    val dbDir = s"$dir/db"
    val writer = new Engine(spark, dbDir)
    try {
      writer.execute(s"""create(oa,"unsorted")
                        |create(ob,"unsorted")
                        |load("$csv")
                        |""".stripMargin)
      val reader = new Engine(spark, dbDir, readOnly = true)
      try {
        assert(reader.execute("s=select(oa,2)\nprint(s)") == Seq("1"))
        val denied = intercept[DbException](reader.execute("create(oc,\"unsorted\")"))
        assert(denied.getMessage.contains("DBEUNSUPPORTED"), denied.getMessage)
      } finally reader.close()
    } finally writer.close()
  }

  test("refresh() re-pins a live reader to the newest commit, no reopen, no torn mix") {
    objectMode() {
      val dir = tmpDir("objstore_refresh")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val writer = new Engine(spark, dbDir)
      try {
        writer.execute(s"""create(oa,"unsorted")
                          |create(ob,"unsorted")
                          |load("$csv")
                          |""".stripMargin)
        val reader = new Engine(spark, dbDir, readOnly = true)
        try {
          assert(reader.execute("s=select(oa,2)\nprint(s)") == Seq("1"))
          // the writer moves on: a new column AND new rows
          writer.execute("create(oc,\"unsorted\")\ninsert(oa,9,ob,40,oc,7)")
          // pinned snapshot: the reader sees neither until it refreshes
          assert(reader.execute("t=select(ob,40)\nprint(t)") == Seq())
          assert(reader.catalog.get("oc").isEmpty)
          reader.refresh()
          // ONE swap carries the whole commit: the new column and the
          // new row arrive together, exactly the writer's state
          assert(reader.catalog.all.map(c => (c.name, c.version, c.nextId))
            == writer.catalog.all.map(c => (c.name, c.version, c.nextId)))
          assert(reader.execute("u=select(ob,40)\nv=fetch(oa,u)\nprint(v)")
            == Seq("9"))
          assert(reader.execute("w=select(oc,7)\nprint(w)") == Seq("0"))
          // refresh on a WRITER is a no-op, never an error
          writer.refresh()
        } finally reader.close()
      } finally writer.close()
    }
  }

  test("refresh() never downgrades a served snapshot to EMPTY on a transient store artifact") {
    objectMode() {
      val dir = tmpDir("objstore_refresh_empty")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val writer = new Engine(spark, dbDir)
      try {
        writer.execute(s"""create(oa,"unsorted")
                          |create(ob,"unsorted")
                          |load("$csv")
                          |""".stripMargin)
        val reader = new Engine(spark, dbDir, readOnly = true)
        try {
          assert(reader.execute("s=select(oa,2)\nprint(s)") == Seq("1"))
          // simulate the stale-LIST/failed-GET interleave a replica can
          // hit against a live writer's GC on an eventually-consistent
          // store: every catalog object momentarily unreadable. The
          // reload's winning-body selection settles on "empty" (the
          // stable all-torn rule) — but a live replica must KEEP its
          // good snapshot, not blank itself mid-serve.
          val catDir = new java.io.File(s"$dbDir/catalog")
          val stash = new java.io.File(s"$dir/stash")
          assert(catDir.renameTo(stash))
          try {
            reader.refresh()
            assert(reader.catalog.all.nonEmpty,
              "refresh blanked a live replica on a transient artifact")
            assert(reader.execute("t=select(oa,2)\nprint(t)") == Seq("1"))
          } finally assert(stash.renameTo(catDir))
          // and once the store is readable again, refresh proceeds
          reader.refresh()
          assert(reader.execute("u=select(oa,2)\nprint(u)") == Seq("1"))
        } finally reader.close()
      } finally writer.close()
    }
  }

  test("refresh() never moves a served snapshot BACKWARD to an older commit") {
    objectMode() {
      val dir = tmpDir("objstore_refresh_regress")
      val csv = writeCsv(dir)
      val dbDir = s"$dir/db"
      val writer = new Engine(spark, dbDir)
      try {
        writer.execute(s"""create(oa,"unsorted")
                          |create(ob,"unsorted")
                          |load("$csv")
                          |""".stripMargin)
        writer.execute("insert(oa,70,ob,80)") // a second, newer commit
        val reader = new Engine(spark, dbDir, readOnly = true)
        try {
          assert(reader.execute("p=select(oa)\nv=fetch(oa,p)\nsum(v)")
            == reader.execute("q=select(oa)\nw=fetch(oa,q)\nsum(w)"))
          val sumAfterInsert =
            reader.execute("a=select(oa)\nb=fetch(oa,a)\nsum(b)")
          // simulate a stale LIST that misses the newest commit: stash
          // the max-named catalog object (c<seq>-e<epoch> sorts by seq)
          // so the winning-body selection resolves the OLDER commit —
          // the served snapshot must not regress
          val catDir = new java.io.File(s"$dbDir/catalog")
          val newest = catDir.listFiles().filter(f =>
            f.isFile && f.getName.startsWith("c")).maxBy(_.getName)
          val sidecar = new java.io.File(catDir, s".${newest.getName}.crc")
          val stash = new java.io.File(dir, "stash-obj")
          val stashCrc = new java.io.File(dir, "stash-crc")
          assert(newest.renameTo(stash))
          if (sidecar.exists) sidecar.renameTo(stashCrc)
          try {
            reader.refresh()
            assert(reader.execute("c=select(oa)\nd=fetch(oa,c)\nsum(d)")
              == sumAfterInsert,
              "refresh regressed a served snapshot to an older commit")
          } finally {
            assert(stash.renameTo(newest))
            if (stashCrc.exists) stashCrc.renameTo(sidecar)
          }
          // store healthy again: refresh still serves the newest state
          reader.refresh()
          assert(reader.execute("e=select(oa)\nf=fetch(oa,e)\nsum(f)")
            == sumAfterInsert)
        } finally reader.close()
      } finally writer.close()
    }
  }

  test("read-only open of a STABLE all-torn catalog is an empty catalog, not DBEIO") {
    objectMode() {
      val dir = tmpDir("objstore_ro_torn")
      val dbDir = s"$dir/db"
      // the first writer crashed mid-first-commit: the catalog dir
      // holds only markerless objects, and that state is STABLE (no
      // live writer, no GC race). A writer opens this as an empty
      // catalog; a reader must too.
      val io = new graft.core.HadoopStoreIO(
        spark.sparkContext.hadoopConfiguration)
      io.write(s"$dbDir/catalog/${"c%020d-e%010d.txt".format(1, 1)}",
        "oa\tunsorted\tv0\n") // no #commit marker: torn
      val ro = new Engine(spark, dbDir, readOnly = true)
      try assert(ro.catalog.all.isEmpty)
      finally ro.close()
    }
  }

  test("MemoryStoreIO CAS: a token witnesses exactly one object state") {
    val io = new graft.core.MemoryStoreIO
    val cas = io.cas.get
    val t1 = cas.createIfAbsent("/db/_lease", "a")
    assert(t1.isDefined)
    assert(cas.createIfAbsent("/db/_lease", "b").isEmpty, "create over existing")
    assert(io.read("/db/_lease").contains("a"))
    val t2 = cas.replaceIfMatch("/db/_lease", t1.get, "c")
    assert(t2.isDefined && t2 != t1)
    assert(cas.replaceIfMatch("/db/_lease", t1.get, "d").isEmpty, "stale token")
    assert(io.read("/db/_lease").contains("c"))
    io.delete("/db/_lease")
    assert(cas.replaceIfMatch("/db/_lease", t2.get, "e").isEmpty, "deleted object")
    // plain ops still work and list() sees one level
    io.write("/db/catalog/c1.txt", "x")
    io.write("/db/catalog/c2.txt", "y")
    assert(io.list("/db/catalog").sorted == Seq("c1.txt", "c2.txt"))
  }

  test("CAS claim is atomic: racing claimants split one-winner with unique epochs") {
    val io = new graft.core.MemoryStoreIO
    // an EXPIRED previous lease: the racy path here would be
    // delete-then-create; with CAS every racer replace-if-matches the
    // same token and the store arbitrates
    io.write("/db/_lease", s"3\tdead-owner\t1000\n")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Long]]()
    val held = new java.util.concurrent.ConcurrentLinkedQueue[graft.core.WriterLease]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val l = new graft.core.WriterLease(io, "/db",
          ttlMs = 60000, settleMs = 500)
        // winners HOLD the lease until every racer finished — releasing
        // mid-race tombstones it (expired), which a later claimant may
        // then legally take over
        try { l.acquire(); results.add(Right(l.epoch)); held.add(l) }
        catch { case e: DbException => results.add(Left(e.code)) }
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    held.forEach(_.release())
    import scala.jdk.CollectionConverters._
    val (lost, won) = results.asScala.toSeq.partition(_.isLeft)
    assert(won.size == 1, s"exactly one winner: $won / $lost")
    assert(lost.forall(_ == Left("DBELOCKED")))
    assert(won.head.exists(_ > 3L), "winner's epoch above the dead lease's")
    // the CAS path never sleeps the settle window; 8 sequentialized
    // settle sleeps would be >= 4s (decade-margin floor per the bench
    // noise notes)
    assert(elapsedMs < 4000, s"CAS claim should skip settle, took $elapsedMs ms")
  }

  test("CAS lease lifecycle: tombstoned epoch survives, successor outranks, deposed writer fences") {
    val io = new graft.core.MemoryStoreIO
    val a = new graft.core.WriterLease(io, "/db", ttlMs = 60000, settleMs = 0)
    a.acquire()
    val ea = a.epoch
    a.release()
    // tombstone, not delete: epoch must survive the clean close
    val Array(e0, _, hb0) = io.read("/db/_lease").get.trim.split("\t")
    assert(e0.toLong == ea && hb0.toLong == 0L)
    val b = new graft.core.WriterLease(io, "/db", ttlMs = 60000, settleMs = 0)
    b.acquire()
    assert(b.epoch > ea)
    // a third claimant while b is LIVE: DBELOCKED via the CAS read
    val c = new graft.core.WriterLease(io, "/db", ttlMs = 60000, settleMs = 0)
    val denied = intercept[DbException](c.acquire())
    assert(denied.code == "DBELOCKED")
    // simulate b's deposition (a successor took the lease object over):
    // b's next fencing check must throw, never write
    io.write("/db/_lease", s"${b.epoch + 1}\tusurper\t${System.currentTimeMillis()}\n")
    val fenced = intercept[DbException](b.checkFenced())
    assert(fenced.code == "DBELOCKED")
    b.release() // no longer owner: must not clobber the usurper's lease
    assert(io.read("/db/_lease").get.contains("usurper"))
  }

  test("full engine on a CAS-capable store: protocol round-trips through the override seam") {
    objectMode() {
      val dir = tmpDir("objstore_cas_engine")
      val dbDir = s"$dir/db"
      Engine.storeIoOverride = Some(d => CasOverlayStoreIO.forDir(d,
        new graft.core.HadoopStoreIO(spark.sparkContext.hadoopConfiguration)))
      try {
        val e1 = new Engine(spark, dbDir)
        try {
          e1.execute("create(oa,\"unsorted\")")
          e1.execute("insert(oa,7)")
        } finally e1.close()
        // reopen: CAS claim over the tombstoned lease, state intact
        val e2 = new Engine(spark, dbDir)
        try {
          val out = e2.execute("p=select(oa)\nv=fetch(oa,p)\nprint(v)")
          assert(out == Seq("7"), out)
        } finally e2.close()
      } finally Engine.storeIoOverride = None
    }
  }

  test("commit history is garbage-collected to a bounded tail") {
    objectMode() {
      val dir = tmpDir("objstore_gc")
      val dbDir = s"$dir/db"
      val e1 = new Engine(spark, dbDir)
      try {
        // every create is a commit; 20 of them must not leave 20 objects
        (1 to 20).foreach(i => e1.execute(s"""create(c$i,"unsorted")"""))
        assert(catalogObjects(dbDir).size <= 9, catalogObjects(dbDir))
      } finally e1.close()
      // and the survivors still carry the full 20-column state
      val e2 = new Engine(spark, dbDir)
      try assert(e2.catalog.all.size == 20)
      finally e2.close()
    }
  }

  test("HadoopStoreIO CAS probe: local FS refuses without writes; casfs certifies BOTH polarities") {
    val base = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // gate 1: no ETags capability -> no CAS, and the refusal is free
    // (no probe object is ever written)
    val localDir = tmpDir("casprobe-local")
    assert(new graft.core.HadoopStoreIO(base, Some(localDir)).cas.isEmpty)
    assert(new java.io.File(localDir).list().isEmpty,
      "the capability gate must refuse before any probe write")
    // no probe root configured -> no CAS, trivially
    assert(new graft.core.HadoopStoreIO(base).cas.isEmpty)
    for ((impl, name) <- Seq(
        classOf[CasFileSystem].getName -> "polarity flag=false",
        classOf[CasFileSystemInverted].getName -> "polarity flag=true")) {
      val conf = new org.apache.hadoop.conf.Configuration(base)
      conf.set("fs.casfs.impl", impl)
      conf.set("fs.casfs.impl.disable.cache", "true")
      val root = s"casfs://${tmpDir("casprobe")}"
      val io = new graft.core.HadoopStoreIO(conf, Some(root))
      val cas = io.cas.getOrElse(fail(s"probe refused casfs with $name"))
      assert(io.list(root).isEmpty, "the probe must clean up its scratch object")
      // token semantics over the REAL Hadoop builder API, both polarities
      val p = s"$root/obj"
      val t1 = cas.createIfAbsent(p, "v1")
      assert(t1.isDefined)
      assert(cas.createIfAbsent(p, "v2").isEmpty, s"$name: second create must lose")
      assert(io.read(p).contains("v1"))
      assert(cas.readToken(p).contains(("v1", t1.get)))
      assert(cas.replaceIfMatch(p, "stale-token", "v3").isEmpty,
        s"$name: bogus token must not replace")
      assert(io.read(p).contains("v1"))
      val t2 = cas.replaceIfMatch(p, t1.get, "v3")
      assert(t2.isDefined && t2 != t1)
      assert(cas.readToken(p).contains(("v3", t2.get)))
      io.delete(p)
      assert(cas.replaceIfMatch(p, t2.get, "v4").isEmpty,
        s"$name: replace-if-match on a deleted object must fail")
      assert(io.read(p).isEmpty)
    }
  }

  test("checkFenced tolerates a torn lease read; a real takeover still fences") {
    // On a no-CAS store every lease rewrite — the writer's own
    // heartbeat included — has a truncate-then-write window in which a
    // concurrent read returns garbage. The composition soak caught
    // checkFenced fencing a HEALTHY writer off exactly that torn read;
    // it must retry past transient unreadability, while a clean read
    // showing another owner (a genuine takeover) fences immediately.
    val mem = new graft.core.MemoryStoreIO
    val tornReads = new java.util.concurrent.atomic.AtomicInteger(0)
    val io = new graft.core.StoreIO {
      override def read(p: String): Option[String] =
        if (p.endsWith("/_lease") && tornReads.getAndUpdate(n =>
            math.max(0, n - 1)) > 0)
          Some("torn-partial-garb") // an in-flight rewrite's prefix
        else mem.read(p)
      override def write(p: String, b: String): Unit = mem.write(p, b)
      override def list(d: String): Seq[String] = mem.list(d)
      override def delete(p: String): Unit = mem.delete(p)
      override def createExclusive(p: String, b: String): Boolean =
        mem.createExclusive(p, b)
      // cas deliberately None: the torn window exists only on the
      // settle-verify (non-CAS) path
    }
    val lease = new graft.core.WriterLease(io, "mem://torn-db",
      ttlMs = 60000, settleMs = 0)
    lease.acquire()
    try {
      // two consecutive torn reads: the retry must see the healthy
      // body underneath and NOT fence
      tornReads.set(2)
      lease.checkFenced()
      // a genuine takeover (different owner, live heartbeat) read
      // CLEANLY fences at once — torn-tolerance must not dull this
      mem.write("mem://torn-db/_lease",
        s"99\tother-owner\t${System.currentTimeMillis()}\n")
      intercept[DbException](lease.checkFenced())
    } finally lease.release()
  }

  test("CAS probe refuses a connector that swallows the existence key (plain no-overwrite is not CAS)") {
    // CasFileSystemSwallowCond accepts fs.option.create.conditional.
    // overwrite silently but never enforces it, honors ETags, and
    // refuses plain create-over-existing (default no-overwrite). A
    // probe whose drill writes don't force overwrite(true) sees the
    // flag=false calibration "pass" off that NON-ATOMIC refusal and
    // certifies a check-then-put as CAS; the shipped probe must refuse.
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.casfs.impl", classOf[CasFileSystemSwallowCond].getName)
    conf.set("fs.casfs.impl.disable.cache", "true")
    val root = s"casfs://${tmpDir("casprobe-swallow")}"
    val io = new graft.core.HadoopStoreIO(conf, Some(root))
    assert(io.cas.isEmpty,
      "a store enforcing only plain no-overwrite must NOT certify")
    assert(io.list(root).isEmpty, "refused probe must still clean its scratch")
  }

  test("CAS probe scratch is per-probe unique; stale crash leftovers swept, live ones kept") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    CasFileSystem.install(conf)
    val root = s"casfs://${tmpDir("casprobe-scratch")}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    // a crashed prior probe's scratch (older than the 10-min bound)...
    val stale = new org.apache.hadoop.fs.Path(p, "_cas_probe.dead-beef")
    fs.create(stale, true).close()
    fs.setTimes(stale, System.currentTimeMillis() - 3600000L, -1)
    // ...and a CONCURRENT probe's live scratch (fresh mtime)
    val live = new org.apache.hadoop.fs.Path(p, "_cas_probe.live-peer")
    fs.create(live, true).close()
    val io = new graft.core.HadoopStoreIO(conf, Some(root))
    assert(io.cas.isDefined,
      "a leftover scratch object must not fail a later certification")
    val names = io.list(root).toSet
    assert(!names.contains("_cas_probe.dead-beef"), "stale scratch swept")
    assert(names == Set("_cas_probe.live-peer"),
      s"live peer scratch untouched, own scratch cleaned: $names")
  }

  test("WriterLease claims atomically over a certified Hadoop connector (casfs)") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    CasFileSystem.install(conf)
    val root = s"casfs://${tmpDir("cas-lease")}/db"
    val io = new graft.core.HadoopStoreIO(conf, Some(root))
    assert(io.cas.isDefined)
    val a = new graft.core.WriterLease(io, root, ttlMs = 60000, settleMs = 0)
    a.acquire()
    val b = new graft.core.WriterLease(io, root, ttlMs = 60000, settleMs = 0)
    intercept[DbException](b.acquire()) // a live lease denies atomically
    a.release() // tombstone: epoch survives the clean close
    b.acquire()
    assert(b.epoch > a.epoch, s"successor ${b.epoch} must outrank ${a.epoch}")
    b.release()
  }
}
