package graft

import scala.collection.concurrent.TrieMap

import graft.core.{StoreCas, StoreIO}

/** Test-only [[StoreIO]] wrappers for the object-store protocol:
  *
  *   - [[CasOverlayStoreIO]] grafts an in-process compare-and-swap
  *     capability onto ANY inner store (the engine fuzz runs the full
  *     engine over a local dir whose control plane then advertises
  *     CAS, like an s3a store driven through a native SDK would).
  *   - [[FaultyStoreIO]] is the adversarial scheduler: it perturbs
  *     visibility and durability within exactly the envelope a real
  *     eventually-settling object store is allowed to occupy — delayed
  *     writes, lost deletes, torn read-backs — driven by a seeded RNG
  *     so every schedule is replayable.
  *
  * Both live in test scope on purpose: production resolves stores via
  * `Engine.storeIoFor`, and these classes exist to be installed
  * through that seam (`Engine.storeIoOverride`) by specs and soaks.
  */
object CasOverlayStoreIO {
  private val perDir = TrieMap.empty[String, CasOverlayStoreIO]

  /** One overlay per store dir — CAS is only atomic against claimants
    * sharing the SAME overlay instance, so concurrent engines in one
    * JVM must resolve to one object (mirroring how a real store's
    * preconditions are global to the bucket, not to the client).
    */
  def forDir(dir: String, mk: => StoreIO): CasOverlayStoreIO =
    perDir.getOrElseUpdate(dir, new CasOverlayStoreIO(mk))
}

final class CasOverlayStoreIO(inner: StoreIO) extends StoreIO { self =>
  private val gens = scala.collection.mutable.HashMap.empty[String, Long]
  private var nextGen = 1L

  private def bump(path: String): Long =
    { val g = nextGen; nextGen += 1; gens(path) = g; g }

  override def read(path: String): Option[String] =
    self.synchronized(inner.read(path))
  override def write(path: String, body: String): Unit =
    self.synchronized { inner.write(path, body); bump(path); () }
  override def list(dir: String): Seq[String] =
    self.synchronized(inner.list(dir))
  override def delete(path: String): Unit =
    self.synchronized { inner.delete(path); gens.remove(path); () }
  override def createExclusive(path: String, body: String): Boolean =
    self.synchronized {
      val ok = inner.createExclusive(path, body)
      if (ok) bump(path)
      ok
    }

  override val cas: Option[StoreCas] = Some(new StoreCas {
    override def readToken(path: String): Option[(String, String)] =
      self.synchronized(
        inner.read(path).map(b =>
          (b, gens.getOrElseUpdate(path, bump(path)).toString)))
    override def createIfAbsent(path: String, body: String): Option[String] =
      self.synchronized {
        if (inner.read(path).isDefined) None
        else { inner.write(path, body); Some(bump(path).toString) }
      }
    override def replaceIfMatch(path: String, token: String,
                                body: String): Option[String] =
      self.synchronized {
        if (inner.read(path).isDefined &&
            gens.get(path).exists(_.toString == token)) {
          inner.write(path, body); Some(bump(path).toString)
        } else None
      }
  })
}

/** Seeded fault injector over a [[StoreIO]]. Faults model what an
  * object store may legally do, never more:
  *
  *   - `delayWrite`: a PUT becomes visible only after a later
  *     operation "settles" it (delayed visibility — the write is
  *     REORDERED past reads that follow it).
  *   - `loseDelete`: a DELETE is acknowledged but never applied (the
  *     object resurfaces — S3's historical delete-visibility lag).
  *   - `tornRead`: a read returns a PREFIX of the body once (HDFS
  *     create-in-progress; a torn object on a non-atomic store).
  *
  * Probabilities are per operation; the RNG is the schedule. CAS (when
  * the inner store has it) is passed through UNPERTURBED: a store that
  * offers preconditions executes them atomically server-side — the
  * faults model the plain data path, not a broken CAS.
  */
final class FaultyStoreIO(inner: StoreIO, seed: Long,
                          pDelayWrite: Double = 0.15,
                          pLoseDelete: Double = 0.10,
                          pTornRead: Double = 0.10) extends StoreIO { self =>
  private val rng = new scala.util.Random(seed)
  // writes held back for delayed visibility: path -> body
  private val pending = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  /** Flush a random prefix of the pending writes (visibility settles
    * in arbitrary order relative to later operations).
    */
  private def settleSome(): Unit = {
    var i = 0
    while (i < pending.length) {
      if (rng.nextDouble() < 0.5) {
        val (p, b) = pending.remove(i)
        inner.write(p, b)
      } else i += 1
    }
  }

  /** Everything eventually becomes visible — call at quiesce points. */
  def settleAll(): Unit = self.synchronized {
    pending.foreach { case (p, b) => inner.write(p, b) }
    pending.clear()
  }

  override def read(path: String): Option[String] = self.synchronized {
    settleSome()
    // a pending (not yet visible) write hides: the reader sees the
    // store state WITHOUT it — unless it happens to settle above
    val base = inner.read(path)
    base match {
      case Some(b) if b.nonEmpty && rng.nextDouble() < pTornRead =>
        Some(b.substring(0, rng.nextInt(b.length))) // strict prefix
      case other => other
    }
  }

  override def write(path: String, body: String): Unit = self.synchronized {
    settleSome()
    if (rng.nextDouble() < pDelayWrite) pending += ((path, body))
    else inner.write(path, body)
  }

  override def list(dir: String): Seq[String] = self.synchronized {
    settleSome(); inner.list(dir)
  }

  override def delete(path: String): Unit = self.synchronized {
    settleSome()
    // lost delete: acknowledged, never applied (also drop any pending
    // write for the path half the time — delete/write pairs reorder)
    if (rng.nextDouble() >= pLoseDelete) {
      val i = pending.indexWhere(_._1 == path)
      if (i >= 0 && rng.nextBoolean()) pending.remove(i)
      inner.delete(path)
    }
  }

  override def createExclusive(path: String, body: String): Boolean =
    self.synchronized {
      settleSome()
      // exclusivity itself is the store's atomic primitive — honored;
      // but the CREATED body may still land with delayed visibility
      // only when nothing is pending on the path
      if (inner.read(path).isDefined || pending.exists(_._1 == path)) false
      else { inner.write(path, body); true }
    }

  override def cas: Option[StoreCas] = inner.cas
}
