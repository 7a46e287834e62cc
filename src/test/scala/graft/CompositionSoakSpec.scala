package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import graft.core.Engine
import graft.server.{NetClient, TcpServer}

/** The FOUR-WAY production composition, soaked under one seeded
  * randomized schedule: concurrent TCP sessions + a mutating writer +
  * a read replica on a refresh timer + vacuum with a short grace, all
  * live at once over one shared store — the reference's deployment
  * topology (one thread per session over shared storage,
  * /root/reference/src/server/server.c:967-1006) with the replica and
  * maintenance roles this engine adds. Each pairwise seam is spec'd
  * alone (TcpServerSpec, ObjectStoreSpec, VacuumSpec); this spec is
  * the composition.
  *
  * Invariants asserted CONTINUOUSLY while the schedule runs:
  *   - per-replica snapshot monotonicity: across refreshes, no column
  *     vanishes and per-column (version, nextId) never decrease
  *     (Catalog.reload's dominance contract);
  *   - no torn reads: `sa` only ever receives appends of 1,2,3,… in
  *     order, so EVERY consistent snapshot satisfies count = c and
  *     sum = c(c+1)/2 — a mix of two versions cannot; `sb` is a
  *     singleton cell updated monotonically, so every read must be
  *     nondecreasing and within the issued range;
  *   - no vacuum-deleted dir is ever read: replica evals bind a
  *     version dir and collect from it; a dir deleted under the read
  *     would surface as an exception — any exception on any role
  *     fails the soak. The replica refreshes every ~30 ms while
  *     vacuum's grace is 20 s — the documented contract is that the
  *     retention must exceed refresh interval + the WORST read
  *     latency, and a full-suite run measured a single replica eval
  *     stalling past 5 s on a loaded box (the original 5 s grace
  *     legally lost a pinned dir; the soak found its own margin bug).
  *
  * One refusal is EXPECTED under this composition and asserted as
  * such: a TCP session's select -> fetch that RACES a concurrent
  * insert can answer `DBECOLDIFFLEN` — fetch validates the bitmap
  * length against the CURRENT column length, the reference's own check
  * (storage.c:1311-1318), so the cross-session race is refused loudly
  * instead of answered with a torn mix (this soak is what pinned that
  * down). Clients retry, as the reference's would.
  *
  * NOTHING is tolerated: any exception on any role fails the soak.
  * Earlier rounds capped a rare Spark-internal `[INTERNAL_ERROR]` on
  * replica actions at 3 per run — an artifact of co-hosting all four
  * roles' plans in ONE SessionState, which the deployment never does
  * (a replica is its own JVM, ServerMain --read-only). The replica now
  * runs on its own `spark.newSession()` — the single-JVM analogue of
  * that topology: same SparkContext, PRIVATE SessionState, so replica
  * planning never races the writer's — and the tolerance is retired
  * (cap 0, queue gone). A FileNotFoundException (the vacuum-contract
  * violation signal) fails like everything else, as before.
  */
class CompositionSoakSpec extends SparkSpec {

  private def netRun(port: Int, script: String): (Boolean, Seq[String], Seq[String]) = {
    val out = collection.mutable.Buffer[String]()
    val err = collection.mutable.Buffer[String]()
    val failed = NetClient.run("127.0.0.1", port, script.linesIterator,
      out += _, err += _)
    (failed, out.toSeq, err.toSeq)
  }

  test("composition soak: TCP sessions + writer + refreshing replica + graced vacuum, 200 randomized steps") {
    soak(tmpDir("composition-soak"))
  }

  test("composition soak in OBJECT mode: the same four roles over lease + versioned-object catalog") {
    // the object-store control plane composes differently: the writer
    // holds a heartbeated LEASE, every catalog mutation is a fenced
    // versioned-object commit with history GC, the replica's refresh
    // re-runs the winning-body selection (racing that GC — the
    // list-retry path), and vacuum's deletes are lease-fenced. Same
    // seeded schedule, same invariants.
    sys.props("graft.store.object") = "true"
    sys.props("graft.lease.ttl.ms") = "60000"
    sys.props("graft.lease.settle.ms") = "5"
    try soak(tmpDir("composition-soak-obj"))
    finally {
      sys.props.remove("graft.store.object")
      sys.props.remove("graft.lease.ttl.ms")
      sys.props.remove("graft.lease.settle.ms")
    }
  }

  private def soak(dbDir: String): Unit = {
    val writer = new Engine(spark, dbDir)
    val server = new TcpServer(writer, port = 0, threads = 8)
    val port = server.start()
    val failures = new ConcurrentLinkedQueue[String]()
    @volatile var stopping = false
    def guard[A](role: String)(body: => A): Option[A] =
      try Some(body) catch {
        case e: Throwable =>
          // teardown interrupts landing mid-eval are expected, not findings
          if (!stopping) {
            def rootOf(t: Throwable): Throwable =
              if (t.getCause != null && t.getCause != t) rootOf(t.getCause)
              else t
            val r = rootOf(e)
            val frames = r.getStackTrace.take(6).mkString(" <- ")
            failures.add(s"$role: ${e.getClass.getSimpleName}: " +
              s"${e.getMessage} (root: $r @ $frames)")
          }
          None
      }
    try {
      // seed: sa takes ordered appends, sb is the update-churn cell
      val (sf, _, serr) = netRun(port,
        """create(sa,"unsorted")
          |create(sb,"unsorted")
          |insert(sa,1)
          |insert(sb,1000)
          |""".stripMargin)
      assert(!sf, serr.mkString("; "))

      // the replica plans on a PRIVATE SessionState (newSession: same
      // SparkContext, isolated analyzer/optimizer/conf) — the
      // single-JVM analogue of the deployed ServerMain --read-only
      // topology, and what lets this soak run at artifact tolerance 0
      val replica = new Engine(spark.newSession(), dbDir, readOnly = true)
      @volatile var stop = false
      val nextSa = new AtomicLong(2L)   // next append value for sa
      val sbVal = new AtomicLong(1000L) // last issued sb value
      val vacuumDeleted = new AtomicLong(0L)
      val raceRefusals = new AtomicLong(0L)

      // ---- replica role: refresh + invariant reads, continuous ----
      // the convergence counters are Atomics: the MAIN thread polls
      // them across threads (plain captured vars have no visibility
      // guarantee); lastSnap is replica-thread-private until join()
      var lastSnap = Map.empty[String, (Long, Long)]
      val lastSaCount = new AtomicLong(0L)
      val lastSb = new AtomicLong(1000L)
      val replicaThread = new Thread(() => {
        while (!stop) {
          guard("replica") {
            replica.refresh()
            val snap = replica.catalog.all
              .map(c => c.name -> ((c.version, c.nextId))).toMap
            lastSnap.foreach { case (n, (v, id)) =>
              val cur = snap.get(n)
              assert(cur.isDefined, s"column $n vanished from the snapshot")
              assert(cur.get._1 >= v && cur.get._2 >= id,
                s"snapshot regressed for $n: $cur < ${(v, id)}")
            }
            lastSnap = snap
            // one eval per column: fetch binds the version ONCE, the
            // aggregates run over that bound intermediate — so (count,
            // sum) is internally consistent by construction and any
            // torn mix of versions breaks the arithmetic invariant
            val saOut = replica.execute(
              "p=select(sa)\nv=fetch(sa,p)\nc=count(v)\ns=sum(v)\ntuple(c,s)")
            val Array(c, s) = saOut.head.stripPrefix("(").stripSuffix(")")
              .split(",").map(_.toLong)
            assert(s == c * (c + 1) / 2,
              s"torn read on sa: count=$c sum=$s (want ${c * (c + 1) / 2})")
            assert(c >= lastSaCount.get(),
              s"sa count went backward: $c < ${lastSaCount.get()}")
            lastSaCount.set(c)
            val sbOut = replica.execute(
              "p=select(sb)\nv=fetch(sb,p)\nprint(v)")
            assert(sbOut.size == 1, s"sb must stay a singleton: $sbOut")
            val sb = sbOut.head.toLong
            assert(sb >= lastSb.get() && sb >= 1000L && sb <= sbVal.get(),
              s"sb read $sb outside [${lastSb.get()}, ${sbVal.get()}]")
            lastSb.set(sb)
          }
          try Thread.sleep(30) catch { case _: InterruptedException => () }
        }
      }, "soak-replica")
      replicaThread.start()

      // ---- vacuum role: short-grace sweeps while everything runs ----
      val vacuumThread = new Thread(() => {
        while (!stop) {
          guard("vacuum") {
            // retention must dominate the replica's refresh interval
            // PLUS its worst single-eval stall on a loaded box (a 5 s
            // grace measurably lost a pinned dir under the full suite)
            val stats = writer.vacuum(retainMs = 20000L)
            vacuumDeleted.addAndGet(stats.deleted)
          }
          try Thread.sleep(150) catch { case _: InterruptedException => () }
        }
      }, "soak-vacuum")
      vacuumThread.start()

      // ---- the seeded 200-step schedule over TCP sessions ----
      // inserts and updates each run on their OWN single lane (their
      // invariants need per-column ordering); reads fan out on a pool —
      // so at any instant up to 4 TCP sessions, the replica and the
      // vacuum are all in flight against the one store
      // deterministic by default; -Dgraft.soak.seed=N explores other
      // schedules (extra seeds are run before each round ships)
      val rnd = new scala.util.Random(
        sys.props.get("graft.soak.seed").flatMap(_.toLongOption)
          .getOrElse(20260815L))
      val insertLane = Executors.newSingleThreadExecutor()
      val updateLane = Executors.newSingleThreadExecutor()
      val readPool = Executors.newFixedThreadPool(2)
      val pending = new ConcurrentLinkedQueue[CountDownLatch]()
      def dispatch(ex: java.util.concurrent.ExecutorService)(body: => Unit): Unit = {
        val done = new CountDownLatch(1)
        pending.add(done)
        ex.execute(() => try body finally done.countDown())
      }
      for (step <- 0 until 200) {
        rnd.nextInt(10) match {
          case r if r <= 3 => // append 1-2 ordered values to sa
            val k = 1 + rnd.nextInt(2)
            dispatch(insertLane) {
              guard("insert-client") {
                val script = (0 until k)
                  .map(_ => s"insert(sa,${nextSa.getAndIncrement()})")
                  .mkString("", "\n", "\n")
                val (f, _, e) = netRun(port, script)
                assert(!f, s"insert failed: ${e.mkString("; ")}")
              }
            }
          case r if r <= 5 => // bump sb (copy-on-write rewrite = churn)
            dispatch(updateLane) {
              guard("update-client") {
                // the issued bound advances BEFORE the commit so a
                // replica read racing the update never sees a value
                // above sbVal (monotone upper bound, never torn)
                val target = sbVal.incrementAndGet()
                val (f, _, e) = netRun(port,
                  s"u=select(sb,${target - 1})\nupdate(u,sb,$target)\n")
                assert(!f, s"update failed: ${e.mkString("; ")}")
              }
            }
          case r if r <= 8 => // a TCP reader session with the same invariants
            dispatch(readPool) {
              guard("read-client") {
                val (f, out, e) = netRun(port,
                  "p=select(sa)\nv=fetch(sa,p)\nc=count(v)\ns=sum(v)\ntuple(c,s)\n")
                if (f) {
                  // the ONE legal refusal: the fetch raced an insert and
                  // the bitmap-length check rejected loudly (see the
                  // class doc) — everything after cascades DBENOVAR.
                  // Any OTHER failure is a finding.
                  assert(e.head.startsWith("DBECOLDIFFLEN") &&
                    e.tail.forall(_.startsWith("DBENOVAR")),
                    s"read failed: ${e.mkString("; ")}")
                  raceRefusals.incrementAndGet()
                } else {
                  val Array(c, s) = out.head.stripPrefix("(").stripSuffix(")")
                    .split(",").map(_.toLong)
                  assert(s == c * (c + 1) / 2, s"torn TCP read: count=$c sum=$s")
                }
              }
            }
          case _ => // a failing session: errors must not disturb anyone
            dispatch(readPool) {
              guard("error-client") {
                val (f, _, e) = netRun(port, "z=select(no_such_col)\n")
                assert(f && e.exists(_.startsWith("DBECOLSELECT")),
                  s"expected DBECOLSELECT, got: ${e.mkString("; ")}")
              }
            }
        }
        if (rnd.nextInt(4) == 0) Thread.sleep(rnd.nextInt(15))
      }
      insertLane.shutdown(); updateLane.shutdown(); readPool.shutdown()
      assert(insertLane.awaitTermination(300, TimeUnit.SECONDS))
      assert(updateLane.awaitTermination(300, TimeUnit.SECONDS))
      assert(readPool.awaitTermination(300, TimeUnit.SECONDS))
      pending.forEach(l => assert(l.await(300, TimeUnit.SECONDS)))

      // let the replica observe the final state of BOTH columns before
      // stopping: waiting on sa alone could let the shutdown interrupt
      // abort the converged iteration's in-flight sb read
      val finalSa = nextSa.get() - 1
      val deadline = System.currentTimeMillis() + 30000
      while ((lastSaCount.get() < finalSa || lastSb.get() < sbVal.get()) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      stopping = true
      stop = true
      replicaThread.interrupt(); vacuumThread.interrupt()
      replicaThread.join(10000); vacuumThread.join(10000)

      assert(failures.isEmpty, failures.toArray.mkString("\n"))
      // liveness: the replica converged to the writer's final state
      assert(lastSaCount.get() == finalSa,
        s"replica never caught up: ${lastSaCount.get()} of $finalSa")
      assert(lastSb.get() == sbVal.get(),
        s"replica never saw the final sb: ${lastSb.get()} of ${sbVal.get()}")
      // the churn was real and vacuum reclaims it (update rewrites left
      // >25 dead versions). A zero-retention sweep is legal HERE and
      // only here — every role has stopped and joined, so no read can
      // be pinned to a dead version — which makes the reclaim assert
      // deterministic regardless of how much the in-soak graced sweeps
      // managed to age out during the schedule itself.
      assert(sbVal.get() > 1010L, s"too little update churn: ${sbVal.get()}")
      if (vacuumDeleted.get() == 0L)
        vacuumDeleted.addAndGet(writer.vacuum(retainMs = 0L).deleted)
      assert(vacuumDeleted.get() > 0L,
        "vacuum reclaimed nothing despite version churn")
      // final writer-side ground truth
      val (ff, fout, fe) = netRun(port,
        "p=select(sa)\nv=fetch(sa,p)\nc=count(v)\ns=sum(v)\ntuple(c,s)\n")
      assert(!ff, fe.mkString("; "))
      assert(fout.head == s"($finalSa,${finalSa * (finalSa + 1) / 2})", fout)
      replica.close()
    } finally {
      server.close()
      writer.close()
    }
  }
}
