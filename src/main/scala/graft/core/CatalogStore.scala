package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

/** How the catalog's serialized body is durably published. Two
  * strategies, chosen by [[Engine]] from the dbDir:
  *
  *   - [[RenameCatalogStore]] — local filesystems: write a temp file,
  *     ATOMIC_MOVE over `catalog.txt`. Fast, POSIX-atomic, exactly the
  *     behavior every prior round shipped.
  *   - [[VersionedCatalogStore]] — rename-less stores: each commit PUTs
  *     a NEW immutable object; the live catalog is defined by an
  *     ordering rule over object names, never by replacing one path.
  */
trait CatalogStore {
  /** One-time setup; returns the current catalog body if one exists. */
  def init(): Option[String]
  /** Durably publish a new catalog body. */
  def commit(body: String): Unit
  /** Object mode: republish `body` under THIS writer's fencing epoch so
    * any still-running deposed writer's later commits (stale epoch)
    * can never win the ordering. Local mode: no-op (the OS lock already
    * excludes concurrent writers).
    */
  def barrier(body: String): Unit
}

/** Local-FS strategy: temp file + atomic rename (the classic POSIX
  * commit). Requires a filesystem where rename is atomic — true for
  * local disks and HDFS, false for object stores.
  */
final class RenameCatalogStore(dbDir: String) extends CatalogStore {
  private val catalogFile = Paths.get(dbDir, "catalog.txt")

  override def init(): Option[String] = {
    Files.createDirectories(Paths.get(dbDir, "cols"))
    if (!Files.exists(catalogFile)) None
    else Some(Files.readString(catalogFile))
  }

  override def commit(body: String): Unit = {
    val tmp = Paths.get(dbDir, "catalog.txt.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, catalogFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def barrier(body: String): Unit = ()
}

/** Rename-less catalog commit over [[StoreIO]] — the last-write-meta
  * protocol (the shape Delta Lake's `_delta_log` and Iceberg's
  * version-hint metadata made standard public knowledge, reduced to a
  * single whole-catalog object since graft's catalog is tiny):
  *
  *   - Commits live under `dbDir/catalog/` as immutable objects named
  *     `c<seq>-e<epoch>.txt` (zero-padded fixed width). `seq` increases
  *     per commit; `epoch` is the writer's [[WriterLease]] fencing
  *     token.
  *   - A commit body ends with a `#commit` marker line. HDFS makes
  *     in-progress writes progressively visible; an object without its
  *     trailing marker is a torn write and is IGNORED by readers — the
  *     previous committed object stays live. Object stores PUT
  *     atomically, so the marker is simply always present there.
  *   - The LIVE catalog is the marker-bearing object with the highest
  *     `(epoch, seq)` — epoch strictly first. That ordering IS the
  *     fencing: a deposed writer still holds a stale epoch, so even if
  *     it wins a commit race its object sorts below everything the new
  *     writer publishes. The new writer's takeover BARRIER (republish
  *     current state under its fresh epoch, [[barrier]]) runs at
  *     acquire time, before it serves a single operation, closing the
  *     window where a stale commit could still be the maximum.
  *   - Each commit garbage-collects: every object ranked below the
  *     newest `Keep` committed ones is deleted. Failed GC deletes are
  *     retried implicitly by the next commit's sweep.
  *
  * Crash anatomy: die before the PUT completes -> torn object, ignored;
  * die after -> the commit is live; die between commit and GC ->
  * surplus history, swept later. No step renames, no step overwrites a
  * live object, every step is idempotent to retry.
  */
final class VersionedCatalogStore(io: StoreIO, dbDir: String,
                                  lease: WriterLease) extends CatalogStore {
  import VersionedCatalogStore.{parseName, Marker}
  private val dir = s"$dbDir/catalog"
  private val Keep = 8
  private var nextSeq = 1L
  // epoch of the winning COMMITTED object at load — a commit below it
  // can never win the ordering, so publishing one would be silent data
  // loss (possible only if the lease object was reset out-of-band);
  // refuse loudly. Torn objects don't count: they never win, whatever
  // their epoch.
  private var committedEpoch = 0L

  private def nameOf(seq: Long, epoch: Long): String =
    f"c$seq%020d-e$epoch%010d.txt"

  override def init(): Option[String] = {
    val entries = io.list(dir).flatMap(n => parseName(n).map(_ -> n))
    if (entries.isEmpty) return None
    // the next commit must outrank even torn/stale objects: seq beyond
    // everything ever listed
    nextSeq = entries.map(_._1._2).max + 1
    VersionedCatalogStore.winningBody(io, dir, entries).map {
      case (ep, body) => committedEpoch = ep; body
    }
  }

  override def commit(body: String): Unit = {
    lease.checkFenced() // the fencing GET: a deposed writer dies here
    if (lease.epoch < committedEpoch)
      throw DbError.locked(
        s"lease epoch ${lease.epoch} behind catalog epoch $committedEpoch " +
          "(lease object reset out-of-band?) — commit would be invisible")
    val seq = nextSeq
    val name = nameOf(seq, lease.epoch)
    io.write(s"$dir/$name", body + Marker + "\n")
    nextSeq = seq + 1
    gc(name)
  }

  override def barrier(body: String): Unit = commit(body)

  /** Sweep history: delete everything outside the newest `Keep` ranks.
    * The object just written is exempt unconditionally — even if a
    * successor's objects outrank it, deleting one's own live commit is
    * never the right move (the successor's sweep will collect it).
    */
  private def gc(justWrote: String): Unit = {
    val ranked = io.list(dir).flatMap(n => parseName(n).map(_ -> n))
      .sortBy(_._1).reverse
    ranked.drop(Keep).collect { case (_, n) if n != justWrote => n }
      .foreach(n => io.delete(s"$dir/$n"))
  }
}

object VersionedCatalogStore {
  private val Name = raw"c(\d{20})-e(\d{10})\.txt".r
  private val Marker = "#commit"

  private[graft] def parseName(n: String): Option[(Long, Long)] = n match {
    case Name(seq, ep) => Some((ep.toLong, seq.toLong))
    case _             => None
  }

  /** The winning committed body over a listed catalog dir: highest
    * (epoch, seq) first, torn (markerless) objects skipped; an object
    * vanishing under a concurrent GC reads as absent (StoreIO.read's
    * contract) and is skipped the same way. Shared by the writer's
    * [[VersionedCatalogStore.init]] and the lock-free
    * [[ReadOnlyCatalogStore]].
    */
  private[graft] def winningBody(io: StoreIO, dir: String,
                                entries: Seq[((Long, Long), String)])
      : Option[(Long, String)] =
    entries.sortBy(_._1).reverse.iterator
      .flatMap { case (ep, n) => io.read(s"$dir/$n").map((ep._1, _)) }
      .collectFirst {
        case (ep, body)
            if body.linesIterator.toSeq.lastOption.contains(Marker) =>
          (ep, body.linesIterator.takeWhile(_ != Marker)
            .mkString("", "\n", "\n"))
      }
}

/** Catalog strategy for LOCK-FREE READERS — the many-reader side of the
  * one-writer topology. Every column version dir is immutable and the
  * live catalog is selected by ordering over immutable commit objects
  * (or read atomically from catalog.txt in local mode), so a reader
  * needs NO lease and NO file lock: it loads the winning committed
  * snapshot at open and serves reads from the version dirs that
  * snapshot references — dirs a concurrent writer never rewrites
  * (copy-on-write) and whose catalog GC never touches (GC sweeps only
  * the catalog history, never data). Mutations through a read-only
  * engine fail loudly (DBEUNSUPPORTED) at the commit seam. Snapshot
  * semantics: the catalog is read ONCE at open; reopen to observe later
  * commits — the natural object-store reader model.
  */
final class ReadOnlyCatalogStore(load: () => Option[String])
    extends CatalogStore {
  override def init(): Option[String] = load()
  override def commit(body: String): Unit =
    throw DbError.unsupported("catalog mutation on a read-only engine")
  override def barrier(body: String): Unit = ()
}
