package graft.core

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Minimal whole-object I/O over a store directory — the control-plane
  * surface the catalog and writer lease need, and NOTHING more. The
  * trait deliberately has no rename and no append: object stores
  * (s3a://, gs://, abfs://) give atomic whole-object PUT, GET, LIST and
  * DELETE, but rename is a non-atomic copy+delete — so the object-mode
  * commit protocol ([[VersionedCatalogStore]], [[WriterLease]]) is
  * expressible, and a rename-commit is not, BY CONSTRUCTION.
  *
  * The data plane (parquet version dirs) never goes through this trait:
  * Spark writes those through the path's Hadoop committer (see SCALE.md
  * for the object-store committer story).
  */
trait StoreIO {
  /** Full object body, or None if absent. A partially-visible object
    * (HDFS create-in-progress) may return a prefix — the commit
    * protocol tolerates that via trailing markers.
    */
  def read(path: String): Option[String]
  /** Whole-object PUT: create or replace. Visible atomically on object
    * stores (PUT-on-close); possibly progressively on HDFS — callers
    * guard with commit markers, never with rename.
    */
  def write(path: String, body: String): Unit
  /** Immediate child object NAMES of `dir` (not full paths); empty if
    * the dir doesn't exist.
    */
  def list(dir: String): Seq[String]
  /** Idempotent single-object delete. */
  def delete(path: String): Unit
  /** Create-if-absent: returns false (writing nothing) when the object
    * already exists. ATOMIC where the underlying store's exclusive
    * create is (HDFS; local POSIX with O_EXCL); emulated
    * (check-then-create, racy) on stores whose Hadoop connector lacks
    * it (S3A) — callers must not rely on atomicity alone, which is why
    * [[WriterLease]] still verify-reads after claiming.
    */
  def createExclusive(path: String, body: String): Boolean

  /** Conditional-write capability, when this store has one: S3
    * `If-None-Match`/`If-Match` conditional PUT, GCS generation
    * preconditions, ABFS ETags, or an in-process atomic map
    * ([[MemoryStoreIO]]). `None` (the default) means callers fall back
    * to the settle-verify protocol; `Some` lets [[WriterLease]] claim,
    * heartbeat and tombstone ATOMICALLY, closing the race windows the
    * emulated path can only narrow. Hadoop ≥ 3.4.2 surfaces the
    * preconditions through `createFile()` builder options
    * (HADOOP-19256), so [[HadoopStoreIO]] probes its store and returns
    * `Some` where the connector demonstrably honors them
    * ([[HadoopCas.probe]]); everywhere else it stays `None`.
    */
  def cas: Option[StoreCas] = None
}

/** Compare-and-swap operations over whole objects. Tokens are opaque
  * version witnesses (ETag analogs): a token observed by [[readToken]]
  * names exactly one historical object state, and a conditional write
  * succeeds only if the object is STILL in that state at write time.
  */
trait StoreCas {
  /** Body + version token, or None if absent. */
  def readToken(path: String): Option[(String, String)]
  /** Atomic create-if-absent: the new token, or None if the object
    * exists (nothing written).
    */
  def createIfAbsent(path: String, body: String): Option[String]
  /** Atomic replace-if-match: the new token, or None if the object is
    * no longer at `token` (nothing written) — including when it has
    * been deleted.
    */
  def replaceIfMatch(path: String, token: String, body: String): Option[String]
}

/** [[StoreIO]] over a Hadoop FileSystem — one implementation serves
  * local paths (LocalFileSystem), hdfs:// and every object-store
  * connector on the classpath, resolved per path from the Spark
  * session's Hadoop configuration.
  *
  * `casProbeRoot`, when given (the store's db root), enables the
  * conditional-PUT capability probe: on first access to [[cas]] the
  * root's connector is behaviorally certified ([[HadoopCas.probe]])
  * and, where it honors the Hadoop 3.4.2 conditional-create options
  * (S3A with conditional writes, and any future connector that adopts
  * them), the lease/catalog protocol gets the ATOMIC claim path
  * instead of settle-verify.
  */
final class HadoopStoreIO(conf: Configuration,
                          casProbeRoot: Option[String] = None) extends StoreIO {
  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  override lazy val cas: Option[StoreCas] =
    casProbeRoot.flatMap(HadoopCas.probe(conf, _))

  override def read(path: String): Option[String] = {
    val p = new HPath(path); val fs = fsOf(p)
    if (!fs.exists(p)) None
    else
      // the exists->open pair is a TOCTOU against concurrent deletes
      // (a deposed writer's GC, a racing lease claim): a file vanishing
      // in between must read as absent, per this method's contract —
      // not crash the caller with a raw FileNotFoundException
      try {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(new String(buf.toByteArray, UTF_8))
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
  }

  override def write(path: String, body: String): Unit = {
    val p = new HPath(path); val fs = fsOf(p)
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    val out = fs.create(p, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
  }

  override def list(dir: String): Seq[String] = {
    val p = new HPath(dir); val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  override def delete(path: String): Unit = {
    val p = new HPath(path)
    fsOf(p).delete(p, false); ()
  }

  override def createExclusive(path: String, body: String): Boolean = {
    val p = new HPath(path); val fs = fsOf(p)
    val parent = p.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    try {
      val out = fs.create(p, false) // overwrite=false: exclusive create
      try out.write(body.getBytes(UTF_8)) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException
          if e.getMessage != null && e.getMessage.contains("exists") => false
    }
  }
}

/** [[StoreCas]] over the Hadoop ≥ 3.4.2 conditional-create builder
  * options (HADOOP-19256): `fs.option.create.conditional.overwrite`
  * (existence precondition — S3 `If-None-Match: *`) and
  * `fs.option.create.conditional.overwrite.etag` (version
  * precondition — S3 `If-Match`, ABFS ETag). Tokens are the
  * connector's ETags, read through [[org.apache.hadoop.fs.EtagSource]].
  *
  * Only constructed by [[HadoopCas.probe]], which BEHAVIORALLY
  * certifies the connector first — the builder contract says `must()`
  * keys a filesystem cannot honor are rejected at `build()`, but the
  * probe doesn't take the API's word for it: it drives a scratch
  * object through create-if-absent (must succeed), create-over-
  * existing (must fail), replace-with-bogus-etag (must fail) and
  * replace-with-real-etag (must succeed), and only a connector that
  * passes all four earns `Some`. The existence option's boolean
  * polarity is CALIBRATED rather than assumed (`ifAbsentFlag`): the
  * probe finds the value under which create succeeds on an absent
  * object and fails on an existing one, so a connector reading the
  * flag either way still maps to correct create-if-absent semantics.
  *
  * Residual (documented) non-atomicity: the token returned by a
  * successful conditional write is read BACK via `getFileStatus`
  * (Hadoop's output stream does not expose the PUT's resulting ETag),
  * body-verified — if another writer replaced the object between our
  * close and the read-back, the body check fails and the write reports
  * None ("lost the race"), which is exactly how [[WriterLease]] treats
  * a lost claim. The conditional write ITSELF is atomic at the store.
  */
final class HadoopCas private[core] (conf: Configuration,
                                     ifAbsentFlag: Boolean) extends StoreCas {
  import HadoopCas._
  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  private def etagOf(fs: FileSystem, p: HPath): Option[String] =
    try fs.getFileStatus(p) match {
      case e: org.apache.hadoop.fs.EtagSource
          if e.getEtag != null && e.getEtag.nonEmpty =>
        Some(e.getEtag)
      case _ => None
    } catch { case _: java.io.FileNotFoundException => None }

  private def readBody(fs: FileSystem, p: HPath): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, UTF_8))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Body + ETag, sampled etag-stably: status → body → status again,
    * retried while a concurrent replace races the pair. After the
    * bounded retries an object under pathological churn reads as
    * absent — callers (the lease claim) treat that as a denied/absent
    * lease, a safe refusal rather than a stale token.
    */
  override def readToken(path: String): Option[(String, String)] = {
    val p = new HPath(path); val fs = fsOf(p)
    var tries = 0
    while (tries < 5) {
      val t1 = etagOf(fs, p)
      if (t1.isEmpty) return None
      val body = readBody(fs, p)
      if (body.isDefined && etagOf(fs, p) == t1) return Some((body.get, t1.get))
      tries += 1
    }
    None
  }

  override def createIfAbsent(path: String, body: String): Option[String] =
    writeCond(path, body, None)

  override def replaceIfMatch(path: String, token: String,
                              body: String): Option[String] =
    writeCond(path, body, Some(token))

  private def writeCond(path: String, body: String,
                        etag: Option[String]): Option[String] = {
    val p = new HPath(path); val fs = fsOf(p)
    try {
      val parent = p.getParent
      if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
      val builder = fs.createFile(p)
      // overwrite(true) EXPLICITLY: on a connector whose createFile
      // defaults to no-overwrite, a bare builder would refuse
      // create-over-existing on its own (non-atomic check-then-put) —
      // the conditional option below must be the ONLY thing that can
      // refuse this write, or the refusal proves nothing about
      // atomicity (see the calibration note on [[HadoopCas.probe]])
      builder.overwrite(true)
      etag match { // must() mutates the builder; the B-typed return is
        case None => builder.must(CondOverwrite, ifAbsentFlag) // not chained
        case Some(t) => builder.must(CondOverwriteEtag, t) // (Scala + the
      } // recursive Java generics don't mix)
      // the precondition is enforced by the connector at close (the
      // PUT) — a failed condition surfaces as an IOException here
      val out = builder.build()
      try out.write(body.getBytes(UTF_8)) finally out.close()
      readToken(path) match {
        case Some((b, tok)) if b == body => Some(tok)
        case _ => None // superseded between close and read-back: lost
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

object HadoopCas {
  /** `Options.CreateFileOptionKeys` values, inlined so the probe also
    * works against a 3.4.x classpath where the constants class moved.
    */
  val CondOverwrite = "fs.option.create.conditional.overwrite"
  val CondOverwriteEtag = "fs.option.create.conditional.overwrite.etag"

  /** Behaviorally certify `root`'s connector for conditional writes
    * and return a calibrated [[HadoopCas]], or None. Gate order:
    * ETags must be advertised (`fs.capability.etags.available` — rules
    * out local/HDFS cheaply, no writes), then the four-step scratch-
    * object drill under `root/_cas_probe.<uuid>` (see [[HadoopCas]]—
    * unique per probe, so concurrent opens never interfere; stale
    * scratch from crashed probes is swept past a 10-minute bound). Any
    * exception — unsupported `must()` keys, read-only store, connector
    * quirks — means `None` and the settle-verify fallback, never a
    * crash: the probe can only ever UPGRADE the protocol.
    */
  def probe(conf: Configuration, root: String): Option[StoreCas] = try {
    val rootP = new HPath(root)
    val fs = rootP.getFileSystem(conf)
    if (!fs.hasPathCapability(rootP,
        org.apache.hadoop.fs.CommonPathCapabilities.ETAGS_AVAILABLE)) None
    else {
      // per-probe UNIQUE scratch: cas is probed lazily inside lease
      // acquire(), so two engines opening the same store concurrently
      // (the normal contention case) run probes at the same time — a
      // shared scratch name would let one probe's delete/recreate
      // spuriously fail the other's calibration and silently downgrade
      // that writer to settle-verify. Stale scratch from crashed
      // probes is swept on entry, but only past a staleness bound so a
      // LIVE concurrent probe's object is never deleted mid-drill.
      try fs.listStatus(rootP)
        .filter(st => st.getPath.getName.startsWith("_cas_probe") &&
          System.currentTimeMillis() - st.getModificationTime > 600000L)
        .foreach(st => fs.delete(st.getPath, false))
      catch { case scala.util.control.NonFatal(_) => () }
      val probeP =
        new HPath(rootP, s"_cas_probe.${java.util.UUID.randomUUID()}")
      try {
        // calibrate the existence-precondition polarity: the honoring
        // flag value creates on absent and refuses on existing. The
        // builder's PLAIN overwrite is forced ON so the conditional
        // option is the only possible refuser — without this, a
        // connector whose createFile defaults to overwrite=false
        // passes the flag=false drill by refusing NON-ATOMICALLY
        // (check-then-put), and the certification would bless a
        // createIfAbsent with no atomicity at all.
        def attempt(flag: Boolean, body: String): Boolean = try {
          val builder = fs.createFile(probeP)
          builder.overwrite(true)
          builder.must(CondOverwrite, flag)
          val out = builder.build()
          try out.write(body.getBytes(UTF_8)) finally out.close()
          true
        } catch { case scala.util.control.NonFatal(_) => false }
        val flag = Seq(false, true).find { f =>
          fs.delete(probeP, false)
          attempt(f, "graft-cas-probe-a") && !attempt(f, "graft-cas-probe-b")
        }
        flag.flatMap { f =>
          val cas = new HadoopCas(conf, f)
          // the object currently holds "...-a"; certify the etag arm
          for {
            (_, tok) <- cas.readToken(probeP.toString)
            if cas.replaceIfMatch(probeP.toString,
              "graft-bogus-etag-0000", "graft-cas-probe-c").isEmpty
            _ <- cas.replaceIfMatch(probeP.toString, tok, "graft-cas-probe-d")
            if cas.readToken(probeP.toString).exists(_._1 == "graft-cas-probe-d")
          } yield cas
        }
      } finally fs.delete(probeP, false)
    }
  } catch { case scala.util.control.NonFatal(_) => None }
}

/** In-process [[StoreIO]] with REAL compare-and-swap — the store model
  * of a cloud object store that exposes conditional PUT (S3
  * If-None-Match / If-Match, GCS generation preconditions, ABFS
  * ETags). Two jobs: (1) prove the lease/catalog protocol under the
  * ATOMIC capability — the ObjectStoreSpec CAS scenarios and the
  * fault-injected soak drive this class; (2) be the reference shape
  * for wiring a native-SDK StoreIO, whose `cas` would map one-to-one
  * onto these three operations. Tokens are monotonically increasing
  * per-path generation numbers, exactly the GCS model.
  *
  * Every mutation is serialized on the store's single monitor — the
  * strongest consistency a real store would offer, which is the right
  * model for a CORRECTNESS harness (fault injection weakens it
  * deliberately, see the protocol soak).
  */
final class MemoryStoreIO extends StoreIO { self =>
  private val objects =
    scala.collection.mutable.HashMap.empty[String, (String, Long)]
  private var nextGen = 1L

  private def norm(p: String): String =
    p.replaceAll("/+", "/").stripSuffix("/")

  override def read(path: String): Option[String] =
    self.synchronized(objects.get(norm(path)).map(_._1))

  override def write(path: String, body: String): Unit =
    self.synchronized {
      objects(norm(path)) = (body, nextGen); nextGen += 1
    }

  override def list(dir: String): Seq[String] = self.synchronized {
    val prefix = norm(dir) + "/"
    objects.keysIterator.filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).takeWhile(_ != '/')).toSeq.distinct
  }

  override def delete(path: String): Unit =
    self.synchronized { objects.remove(norm(path)); () }

  override def createExclusive(path: String, body: String): Boolean =
    self.synchronized {
      val k = norm(path)
      if (objects.contains(k)) false
      else { objects(k) = (body, nextGen); nextGen += 1; true }
    }

  override val cas: Option[StoreCas] = Some(new StoreCas {
    override def readToken(path: String): Option[(String, String)] =
      self.synchronized(
        objects.get(norm(path)).map { case (b, g) => (b, g.toString) })
    override def createIfAbsent(path: String, body: String): Option[String] =
      self.synchronized {
        val k = norm(path)
        if (objects.contains(k)) None
        else {
          val g = nextGen; nextGen += 1; objects(k) = (body, g)
          Some(g.toString)
        }
      }
    override def replaceIfMatch(path: String, token: String,
                                body: String): Option[String] =
      self.synchronized {
        val k = norm(path)
        objects.get(k) match {
          case Some((_, g)) if g.toString == token =>
            val ng = nextGen; nextGen += 1; objects(k) = (body, ng)
            Some(ng.toString)
          case _ => None
        }
      }
  })
}

/** Single-writer LEASE over [[StoreIO]] — the object-store replacement
  * for the local-FS advisory file lock, built from the public
  * lease/fencing-token recipe (the ZooKeeper/Chubby pattern; GFS/HDFS
  * lease recovery uses the same epoch idea):
  *
  *   - The lease lives at `dbDir/_lease` as one small object:
  *     `epoch \t owner-uuid \t heartbeat-millis`.
  *   - ACQUIRE reads it; a live lease (heartbeat within `ttlMs`) by
  *     another owner is DBELOCKED. Absent or expired, the claimant
  *     writes `epoch+1 / its uuid / now`, waits `settleMs`, and
  *     re-reads: still its uuid -> acquired; someone else's -> lost the
  *     race, DBELOCKED. When the store advertises compare-and-swap
  *     ([[StoreIO.cas]] — S3 If-None-Match, GCS preconditions, ABFS
  *     ETags, [[MemoryStoreIO]]), the claim IS one atomic conditional
  *     write (create-if-absent, or replace-if-match over the expired
  *     lease's token) and the race window is zero: no settle, no
  *     verify. Without CAS the write-settle-verify window is not
  *     zero — what makes the protocol SAFE anyway is that every
  *     catalog commit is fenced by epoch (see
  *     [[VersionedCatalogStore]]): a deposed writer's commits carry a
  *     stale epoch and can never win the catalog ordering.
  *   - A daemon HEARTBEAT rewrites the lease every `ttlMs / 3`. If a
  *     read-back ever shows a different owner or a higher epoch, the
  *     lease marks itself FENCED — every later fencing check throws,
  *     so a paused-then-resumed writer (GC pause, VM migration — the
  *     classic fencing scenario) fails loudly instead of corrupting.
  *     The heartbeat is also STALENESS-GUARDED: if more than `ttlMs`
  *     has passed since this writer's last successful lease write, it
  *     fences itself WITHOUT writing — a lease that old may legally
  *     have been taken over, and writing would clobber the successor's
  *     object (the read-then-write of a resumed pauser is exactly the
  *     race a store without CAS cannot exclude; refusing to write when
  *     the lease could have expired excludes it by the TTL contract).
  *   - Timestamps compare across processes, so TTL expiry assumes
  *     bounded clock skew between writers (document ±ttl/3 headroom);
  *     fencing does NOT depend on clocks, only on epoch ordering.
  *
  * RELEASE stops the heartbeat and TOMBSTONES the lease if still owned:
  * the object is rewritten with heartbeat 0 — expired forever — rather
  * than deleted, so the EPOCH SURVIVES a clean close and the next
  * writer always claims a strictly higher one. (Deleting would reset
  * the next claimant to epoch 1, whose catalog objects sort below
  * everything an earlier higher-epoch writer committed — acknowledged
  * writes would silently lose the ordering.) A crashed process simply
  * stops heartbeating: its lease expires after `ttlMs` and the next
  * writer takes over with a higher epoch — no unlock step, matching
  * how the OS releases a dead process's file lock in local mode.
  */
final class WriterLease(io: StoreIO, dbDir: String,
                        ttlMs: Long, settleMs: Long) {
  private val leasePath = s"$dbDir/_lease"
  val owner: String = java.util.UUID.randomUUID().toString
  @volatile private var myEpoch: Long = -1L
  @volatile private var fenced = false
  @volatile private var stopped = false
  // wall-clock of this writer's last successful lease write (claim or
  // heartbeat) — the staleness guard's reference point
  @volatile private var lastWriteOk = 0L
  // serializes lease WRITES between the heartbeat and release(): the
  // heartbeat's read can return just before release tombstones, and
  // Hadoop store I/O ignores interrupts, so without mutual exclusion a
  // straggling heartbeat write could stamp a fresh heartbeat OVER the
  // tombstone and spuriously lock the next writer out for a TTL
  private val writeMutex = new Object
  private var beat: Thread = _

  /** The fencing token every catalog commit embeds. */
  def epoch: Long = myEpoch

  private def parse(body: String): Option[(Long, String, Long)] = {
    val f = body.trim.split("\t")
    if (f.length < 3) None
    else for (e <- f(0).toLongOption; hb <- f(2).toLongOption)
      yield (e, f(1), hb)
  }

  /** Read-and-parse the lease, tolerating the TORN window of a non-CAS
    * rewrite: on stores without atomic whole-object PUT (local FS,
    * HDFS) every lease rewrite — our own heartbeat's included — passes
    * through a truncate-then-write window in which a concurrent read
    * returns empty/partial bytes. A torn or absent read is therefore
    * not authoritative (the same reasoning as acquire()'s grace
    * re-read): retry a few beats before concluding. A GENUINE takeover
    * parses as a different owner on the first clean read and is acted
    * on immediately; only unreadable states retry. After the bounded
    * retries the caller treats the lease as gone — the safe refusal.
    */
  private def readLeaseParsed(): Option[(Long, String, Long)] = {
    var tries = 0
    var out = io.read(leasePath).flatMap(parse)
    while (out.isEmpty && tries < 3) {
      tries += 1
      Thread.sleep(25L * tries)
      out = io.read(leasePath).flatMap(parse)
    }
    out
  }

  /** One lease write, atomically conditioned on the lease still being
    * OURS at `myEpoch`: true if written. With store CAS the condition
    * and the write are ONE atomic step (replace-if-match on the token
    * read); without, it is the read-then-write the protocol's fencing
    * was built to tolerate.
    */
  private def writeIfStillOurs(newBody: String): Boolean = io.cas match {
    case Some(c) => c.readToken(leasePath) match {
      case Some((b, tok))
          if parse(b).exists(t => t._2 == owner && t._1 == myEpoch) =>
        c.replaceIfMatch(leasePath, tok, newBody).isDefined
      case _ => false
    }
    case None => readLeaseParsed() match {
      case Some((e, o, _)) if o == owner && e == myEpoch =>
        io.write(leasePath, newBody); true
      case _ => false
    }
  }

  def acquire(): Unit = {
    val now = System.currentTimeMillis()
    var raw = io.read(leasePath)
    // A torn or absent lease on a store WITHOUT atomic writes is not
    // authoritative: a live writer's non-CAS heartbeat rewrite
    // (create-overwrite = truncate window on HDFS/local) can read as
    // absent or torn mid-flight, and deposing it on that evidence
    // would spuriously kill a healthy in-TTL writer. If the store has
    // any history (so "absent" can't just mean "fresh store"), re-read
    // after a grace beat — an in-progress rewrite completes in
    // milliseconds; a crashed claimant's torn object stays torn.
    if (raw.flatMap(parse).isEmpty && io.cas.isEmpty &&
        (raw.isDefined || io.list(s"$dbDir/catalog").nonEmpty ||
          io.list(s"$dbDir/_epochs").nonEmpty)) {
      Thread.sleep(math.max(1L, math.min(ttlMs / 6, 200L)))
      raw = io.read(leasePath)
    }
    val cur = raw.flatMap(parse)
    cur match {
      case Some((_, o, hb)) if o != owner && now - hb < ttlMs =>
        throw DbError.locked(s"$dbDir (lease held by $o)")
      case _ => ()
    }
    // epoch monotonicity has THREE witnesses: the lease object, the
    // committed catalog history (object names carry their epoch —
    // VersionedCatalogStore's `c<seq>-e<epoch>.txt`), and the epoch
    // CLAIM objects below. Flooring on all of them means even a
    // deleted or torn lease object cannot make a new writer claim an
    // epoch at-or-below anything ever committed
    val epochsDir = s"$dbDir/_epochs"
    val claimedEpoch = io.list(epochsDir)
      .flatMap(n => raw"e(\d{10})".r.findFirstMatchIn(n).map(_.group(1).toLong))
      .maxOption.getOrElse(0L)
    val catalogEpoch = io.list(s"$dbDir/catalog")
      .flatMap(n => raw"-e(\d{10})\.txt$$".r.findFirstMatchIn(n)
        .map(_.group(1).toLong))
      .maxOption.getOrElse(0L)
    val floor = math.max(math.max(cur.map(_._1).getOrElse(0L), catalogEpoch),
      claimedEpoch)
    // EPOCH UNIQUENESS via exclusive create: each epoch number is a
    // one-shot claim object, so two racers that both saw the same
    // expired lease can never end up sharing an epoch — without this,
    // two claimants computing the same nextEpoch could both pass the
    // settle-verify in an unlucky interleave, and same-epoch commits
    // are outside what (epoch, seq) fencing can arbitrate (a later PUT
    // could even overwrite the other's same-named committed object).
    // Atomic where the store's exclusive create is; on emulated stores
    // the verify-read below remains the arbiter. Claim objects are tiny
    // and swept beyond a bounded tail.
    var nextEpoch = floor + 1L
    var tries = 0
    while (!io.createExclusive(f"$epochsDir/e$nextEpoch%010d", owner) && {
      tries += 1; tries < 64
    }) nextEpoch += 1L
    if (tries >= 64)
      throw DbError.locked(s"$dbDir (cannot claim an epoch: 64 consecutive collisions)")
    io.list(epochsDir)
      .flatMap(n => raw"e(\d{10})".r.findFirstMatchIn(n).map(_.group(1).toLong -> n))
      .filter(_._1 <= nextEpoch - 16)
      .foreach { case (_, n) => io.delete(s"$epochsDir/$n") }
    // A lease object that EXISTS but doesn't parse (a torn claim write
    // from a crashed process — confirmed torn by the grace re-read
    // above) is replaced like an expired one: it can never renew, and
    // leaving it would lock the store out forever. Its epoch is
    // unknowable, so the catalog's committed-epoch floor (see
    // VersionedCatalogStore.commit) is the backstop if the torn object
    // had hidden a higher epoch.
    val body = s"$nextEpoch\t$owner\t${System.currentTimeMillis()}\n"
    io.cas match {
      case Some(c) =>
        // ATOMIC claim: absent -> create-if-absent; present (expired or
        // torn — a live lease threw above) -> replace-if-match on the
        // token of a fresh read. Either way a racing claimant makes our
        // conditional write fail cleanly — no delete window, no settle
        // sleep, no verify read: the store arbitrates the race itself.
        val claimed = c.readToken(leasePath) match {
          case None => c.createIfAbsent(leasePath, body).isDefined
          case Some((b, tok)) =>
            parse(b) match {
              case Some((_, o, hb)) if o != owner &&
                  System.currentTimeMillis() - hb < ttlMs =>
                // went live between our first read and this one
                throw DbError.locked(s"$dbDir (lease held by $o)")
              case _ => c.replaceIfMatch(leasePath, tok, body).isDefined
            }
        }
        if (!claimed)
          throw DbError.locked(s"$dbDir (lost lease race at claim)")
        myEpoch = nextEpoch
        lastWriteOk = System.currentTimeMillis()
      case None =>
        // claim. Absent lease: exclusive create — ATOMIC on stores with
        // exclusive create (HDFS, local), so a simultaneous claimant
        // loses immediately rather than at the verify read. Expired
        // lease: delete then exclusive create — the delete reopens a
        // small window (a racer's delayed delete can remove a fresh
        // winner's claim), which the settle-verify below still catches;
        // epoch fencing keeps even an undetected double-claim safe at
        // the catalog.
        if (raw.isDefined) io.delete(leasePath)
        if (!io.createExclusive(leasePath, body))
          throw DbError.locked(s"$dbDir (lost lease race at claim)")
        if (settleMs > 0) Thread.sleep(settleMs)
        io.read(leasePath).flatMap(parse) match {
          case Some((e, o, _)) if o == owner && e == nextEpoch =>
            myEpoch = e
            lastWriteOk = System.currentTimeMillis()
          case other => throw DbError.locked(
            s"$dbDir (lost lease race: ${other.map(_._2).getOrElse("<gone>")})")
        }
    }
    beat = new Thread(() => {
      while (!stopped && !fenced) {
        try {
          Thread.sleep(math.max(1L, ttlMs / 3))
          if (!stopped) {
            // staleness guard: past the TTL since our last write, the
            // lease may LEGALLY have been taken over during a pause —
            // even if a read still showed us (we could be reading our
            // own about-to-be-replaced object, or have raced the
            // successor's claim). Refuse to write; fence. Within the
            // TTL no legal takeover can have happened (the lease
            // wasn't expired), so the rewrite cannot clobber a
            // successor.
            if (System.currentTimeMillis() - lastWriteOk > ttlMs)
              fenced = true
            else writeMutex.synchronized {
              // stopped is re-checked UNDER the mutex: release() sets
              // it before taking the mutex to tombstone, so a
              // heartbeat that lost the race can no longer write. The
              // ownership re-check and the write are one atomic CAS on
              // stores that have it; read-then-write otherwise.
              if (!stopped) {
                if (writeIfStillOurs(
                    s"$myEpoch\t$owner\t${System.currentTimeMillis()}\n"))
                  lastWriteOk = System.currentTimeMillis()
                else fenced = true // deposed — stop renewing, fail loud
              }
            }
          }
        } catch {
          case _: InterruptedException => () // release() interrupts
          case scala.util.control.NonFatal(_) => () // transient IO: retry next beat
        }
      }
    }, "graft-lease-heartbeat")
    beat.setDaemon(true)
    beat.start()
  }

  /** Commit-time fencing: re-read the lease and verify this writer still
    * owns the CURRENT epoch. One small GET per catalog mutation —
    * mutations are control-plane-rare next to data volume, and the read
    * is what turns the no-CAS acquire window from a correctness hole
    * into a liveness nuisance.
    */
  def checkFenced(): Unit = {
    if (fenced) throw DbError.locked(s"$dbDir (lease fenced: deposed writer)")
    // same staleness rule as the heartbeat: past the TTL since our last
    // successful lease write we cannot PROVE the lease wasn't legally
    // taken over during a pause (a resumed pauser may even be reading a
    // lease object it clobbered) — fail loud rather than trust the read
    if (System.currentTimeMillis() - lastWriteOk > ttlMs) {
      fenced = true
      throw DbError.locked(s"$dbDir (lease fenced: heartbeat stale past TTL)")
    }
    // the read holds writeMutex so it can never interleave with OUR OWN
    // heartbeat's non-atomic rewrite (fencing a healthy writer off a
    // torn read of its own in-flight heartbeat — found by the
    // composition soak); readLeaseParsed's retry covers the same window
    // for ANOTHER process's write
    writeMutex.synchronized(readLeaseParsed()) match {
      case Some((e, o, _)) if o == owner && e == myEpoch => ()
      case _ =>
        fenced = true
        throw DbError.locked(s"$dbDir (lease fenced: deposed writer)")
    }
  }

  def release(): Unit = {
    stopped = true // set BEFORE taking the mutex: the heartbeat's
    // under-mutex re-check then guarantees no lease write after ours
    if (beat != null) { beat.interrupt(); beat.join(1000) }
    if (!fenced) try writeMutex.synchronized {
      // TOMBSTONE (heartbeat 0 = expired forever), never delete: the
      // epoch must survive a clean close so the next writer claims a
      // strictly higher one — a deleted lease would reset epochs to 1
      // and the new writer's catalog objects would sort below every
      // earlier commit. Only a lease we still own is touched (an
      // atomic condition under store CAS). Best-effort: a store error
      // here just leaves the lease to expire by TTL, which is the
      // crash path anyway
      writeIfStillOurs(s"$myEpoch\t$owner\t0\n"); ()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
