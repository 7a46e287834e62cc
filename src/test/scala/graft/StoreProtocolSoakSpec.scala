package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DbException, MemoryStoreIO, StoreCas, StoreIO,
  VersionedCatalogStore, WriterLease}

/** Adversarial-scheduler soak for the object-store control plane: many
  * seeded schedules of claim / commit / crash / clean-close / expiry
  * steps, executed against a [[FaultyStoreIO]] (delayed-visibility
  * writes, lost deletes, torn reads) over an in-memory store — run
  * with BOTH store capabilities (plain, and conditional-PUT via
  * [[MemoryStoreIO]]'s CAS). The r14 review passes found 13 protocol
  * holes by READING; this finds the next one by EXECUTING: every
  * schedule checks the two safety invariants the protocol exists for,
  *
  *   1. no two successful acquires ever share an epoch, and
  *   2. no acknowledged commit is lost: once every fault settles, the
  *      store's winning committed body is exactly the LAST body
  *      acknowledged by the highest-epoch writer that got any
  *      acknowledgement — the (epoch, seq) ordering's promise.
  *
  * Liveness is deliberately out of scope (a fault can make a claim or
  * commit FAIL — that is the protocol refusing to guess); only
  * acknowledged effects carry obligations. The scheduler is
  * deterministic per seed: a failure line prints the seed, and
  * re-running that seed replays the exact schedule.
  */
class StoreProtocolSoakSpec extends AnyFunSuite {

  /** A MemoryStoreIO with its CAS capability hidden — the "plain S3"
    * model, forcing the lease onto the settle-verify path.
    */
  private final class NoCas(inner: StoreIO) extends StoreIO {
    override def read(p: String): Option[String] = inner.read(p)
    override def write(p: String, b: String): Unit = inner.write(p, b)
    override def list(d: String): Seq[String] = inner.list(d)
    override def delete(p: String): Unit = inner.delete(p)
    override def createExclusive(p: String, b: String): Boolean =
      inner.createExclusive(p, b)
    override def cas: Option[StoreCas] = None
  }

  private final case class Writer(lease: WriterLease,
                                  cat: VersionedCatalogStore,
                                  var alive: Boolean)

  /** Cross-schedule coverage counters: a soak whose schedules never
    * deny a claim or fence a writer isn't adversarial enough to mean
    * anything — printed at the end so the assertion below can hold the
    * soak to a minimum of actual conflict.
    */
  private val stats = scala.collection.mutable.Map(
    "acquired" -> 0L, "denied" -> 0L, "acked" -> 0L, "fenced" -> 0L,
    "takeovers" -> 0L).withDefaultValue(0L)

  /** One schedule. Returns the epochs of every successful acquire (for
    * the cross-schedule uniqueness check) — asserts the commit-loss
    * invariant internally.
    */
  private def runSchedule(seed: Long, withCas: Boolean): Unit = {
    val mem = new MemoryStoreIO
    val base: StoreIO = if (withCas) mem else new NoCas(mem)
    val io = new FaultyStoreIO(base, seed)
    val rng = new scala.util.Random(seed ^ 0x5eed5eedL)
    val db = "/soak"
    // huge TTL: heartbeat threads stay dormant; expiry is an explicit
    // scheduler step (hb rewritten into the past through the raw store,
    // modeling clock passage without waiting for it)
    val ttl = 3600000L

    val epochsSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
    // acknowledged commits in order: (epoch, body)
    val acks = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val writers = scala.collection.mutable.ArrayBuffer.empty[Writer]
    var n = 0

    def liveWriter: Option[Writer] = writers.reverseIterator.find(_.alive)

    val steps = 12 + rng.nextInt(24)
    (0 until steps).foreach { _ =>
      rng.nextInt(12) match {
        case 0 | 1 | 2 => // a claimant appears (maybe against a holder)
          val l = new WriterLease(io, db, ttlMs = ttl, settleMs = 0)
          try {
            l.acquire()
            epochsSeen += l.epoch
            stats("acquired") += 1
            if (writers.exists(_.alive)) stats("takeovers") += 1
            val cat = new VersionedCatalogStore(io, db, l)
            cat.init()
            writers += Writer(l, cat, alive = true)
          } catch { case _: DbException => stats("denied") += 1 }
        case 3 | 4 | 5 | 6 => // the live writer commits
          liveWriter.foreach { w =>
            n += 1
            // trailing newline: the marker is a LINE, as the engine's
            // catalog serializer guarantees
            val body = s"state-$n e${w.lease.epoch}\n"
            try {
              w.cat.commit(body); acks += ((w.lease.epoch, body.trim))
              stats("acked") += 1
            }
            catch { case _: DbException => w.alive = false; stats("fenced") += 1 }
          }
        case 7 => // clean close: tombstone, epoch survives
          liveWriter.foreach { w =>
            w.lease.release(); w.alive = false
          }
        case 8 => // crash: vanish without releasing (lease left fresh)
          liveWriter.foreach(_.alive = false)
        case 9 => // clock passage: the current lease's TTL elapses
          mem.read(s"$db/_lease").foreach { b =>
            val f = b.trim.split("\t")
            if (f.length >= 3 && f(2).toLongOption.exists(_ != 0L))
              mem.write(s"$db/_lease", s"${f(0)}\t${f(1)}\t1000\n")
          }
        case _ => // a lock-free READER probes mid-schedule, THROUGH the
          // faults: whatever winning body it resolves must be some
          // acknowledged commit — never a torn object, never an
          // un-acknowledged write (the read-replica model's safety
          // half; which snapshot it lands on is liveness, not checked)
          val dir = s"$db/catalog"
          val entries = io.list(dir)
            .flatMap(nm => VersionedCatalogStore.parseName(nm).map(_ -> nm))
          VersionedCatalogStore.winningBody(io, dir, entries).foreach {
            case (_, body) =>
              stats("reader_hits") += 1
              assert(acks.exists(_._2 == body.trim),
                s"seed=$seed cas=$withCas: reader observed '$body' " +
                  s"which no writer ever had acknowledged (acks=$acks)")
          }
      }
    }

    // quiesce: every acknowledged PUT becomes visible, then judge
    io.settleAll()
    assert(epochsSeen.distinct.size == epochsSeen.size,
      s"seed=$seed cas=$withCas: double-claimed epoch among $epochsSeen")
    if (acks.nonEmpty) {
      val maxEpoch = acks.map(_._1).max
      val expected = acks.filter(_._1 == maxEpoch).last._2
      val entries = mem.list(s"$db/catalog")
        .flatMap(nm => VersionedCatalogStore.parseName(nm).map(_ -> nm))
      val got = VersionedCatalogStore.winningBody(mem, s"$db/catalog", entries)
        .map(_._2.trim)
      assert(got.contains(expected),
        s"seed=$seed cas=$withCas: winning body $got != last acknowledged " +
          s"'$expected' (acks=$acks)")
    }
    // thread hygiene only — the invariants are already judged
    writers.foreach(w => w.lease.release())
  }

  test("1000+ fault-injected schedules: epochs unique, no acknowledged commit lost (both capabilities)") {
    (0L until 600L).foreach { seed =>
      runSchedule(seed, withCas = true)
      runSchedule(seed, withCas = false)
    }
    info(s"soak coverage: $stats")
    // the soak must actually generate conflict, or the invariants are
    // vacuous: claims denied, writers fenced mid-life, live takeovers
    assert(stats("denied") > 100 && stats("fenced") > 100 &&
      stats("takeovers") > 100 && stats("acked") > 1000 &&
      stats("reader_hits") > 500, stats.toString)
  }
}
