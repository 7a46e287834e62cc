package graft.core

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.lang.{Op, Parser}
import graft.lang.Op._
import graft.operators.ColumnOps
import graft.core.Intermediate.{Ids, Vals}
import graft.core.Align

/** The engine: a database directory + script interpreter.
  *
  * Replaces the reference's client/TCP/threadpool topology
  * (/root/reference/src/server/server.c) with in-process sessions over one
  * SparkSession — Spark's own cluster runtime supplies the distribution the
  * reference got from threads. Each [[Session]] holds the per-connection
  * variable environment (server.c:45-268); the catalog is shared and
  * synchronized.
  *
  * Evaluation is declarative-lazy: operators build DataFrame plans,
  * Catalyst fuses the reference's eager select->fetch->agg chains into
  * single Spark jobs, and `.collect()` happens only at emission points
  * (print/tuple/bare ops) — never mid-pipeline.
  */
final class Engine(val spark: SparkSession, val dbDir: String,
                   val readOnly: Boolean = false)
    extends AutoCloseable {
  /** Writer engines only. Acquired BEFORE the catalog touches anything:
    * a second live WRITER must fail loudly without reading or writing a
    * byte of the store. Store mode decides the mechanism: local dbDirs
    * use the OS advisory file lock + rename-commit catalog;
    * object-store dbDirs (hdfs://, s3a://, ... — or any path under
    * `-Dgraft.store.object`) use the WriterLease + versioned-object
    * catalog, which never renames.
    *
    * READ-ONLY engines take NO lock and NO lease: column versions are
    * immutable copy-on-write dirs and the live catalog is an atomic
    * file (local) or an ordering over immutable commit objects
    * (object mode), so any number of readers can open concurrently —
    * with or without a live writer — each pinned to the committed
    * SNAPSHOT at its open (reopen to observe later commits). Mutations
    * through a read-only engine fail DBEUNSUPPORTED at the catalog
    * commit seam.
    */
  private val writerLock: Option[Engine.WriterLock] =
    if (readOnly) None else Some(Engine.acquireWriterLock(spark, dbDir))
  // a throwing catalog load (malformed catalog record) must release the
  // lock on its way out — there is no Engine instance to close(), and a
  // leaked lock would turn every retry-after-repair into a misleading
  // DBELOCKED for the rest of the JVM's life
  val catalog: Catalog =
    try new Catalog(dbDir, writerLock match {
      case Some(Engine.LeaseLock(_, io, lease)) =>
        new VersionedCatalogStore(io, dbDir, lease)
      case Some(_: Engine.FileLock) => new RenameCatalogStore(dbDir)
      case None => new ReadOnlyCatalogStore(() =>
        if (Engine.isObjectStore(dbDir)) {
          val io = Engine.storeIoFor(spark, dbDir)
          val dir = s"$dbDir/catalog"
          // LIST-then-read races the live writer's catalog GC (the
          // reader holds no lease, so nothing excludes a concurrent
          // sweep deleting every listed object before the reads). The
          // writer's own init never faces this — the lease excludes
          // other writers. Retry with a fresh listing. Two DISTINCT
          // no-winner states must be told apart: a GC race (the
          // listing keeps changing — retry, and entries present but no
          // readable winner after retries is an error, never a
          // silently empty catalog) vs a STABLE all-torn store (the
          // same markerless entries twice in a row — the first writer
          // crashed mid-first-commit; a writer opens that store as an
          // empty catalog, so a reader must too, not DBEIO).
          // Store contract this leans on (writer init shares it): a
          // LIST must eventually include every committed object, and an
          // object absent from a GET after being listed is deleted, not
          // pending. A store that can serve the SAME stale listing
          // twice while hiding every committed object would open (a
          // reader or a writer alike) as empty — that exposure is a
          // fresh open's only; a LIVE replica is protected by
          // Catalog.reload's dominance guard, which refuses to move a
          // served snapshot backward or blank it.
          var out: Option[String] = None
          var settled = false
          var attempt = 0
          var prevNames: Seq[String] = null
          while (!settled) {
            val entries = io.list(dir)
              .flatMap(n => VersionedCatalogStore.parseName(n).map(_ -> n))
            if (entries.isEmpty) settled = true // genuinely empty store
            else VersionedCatalogStore.winningBody(io, dir, entries) match {
              case Some((_, body)) => out = Some(body); settled = true
              case None =>
                val names = entries.map(_._2).sorted
                if (prevNames != null && names == prevNames)
                  settled = true // stable all-torn: open empty, like a writer
                else {
                  prevNames = names
                  attempt += 1
                  if (attempt >= 5)
                    throw DbError.ioError(
                      s"cannot read a committed catalog from $dir after " +
                        "5 attempts (raced a writer's GC every time?)")
                  Thread.sleep(50L * attempt)
                }
            }
          }
          out
        } else {
          val f = java.nio.file.Paths.get(dbDir, "catalog.txt")
          if (java.nio.file.Files.exists(f))
            Some(java.nio.file.Files.readString(f))
          else None
        })
    })
    catch { case e: Throwable =>
      writerLock.foreach(Engine.releaseWriterLock); throw e
    }

  /** Where the TCP server spools client-streamed CSV bodies: the dbDir
    * itself when it's a plain local directory (spool visibility matches
    * the store's lifetime); the JVM temp dir when the store is remote
    * (a spool is transient local scratch — it must never cost an
    * object-store PUT, and `java.nio.Files` can't address s3a:// paths
    * anyway).
    */
  def spoolDir: java.nio.file.Path = writerLock match {
    case Some(_: Engine.FileLock) => java.nio.file.Paths.get(dbDir)
    case _ => java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
  }

  /** Release the single-writer lock (file lock or lease). The restart
    * pattern (stop one server process, start another on the same store)
    * is modeled as close() + new Engine; a crashed PROCESS needs no
    * close — the OS releases its file lock, and a lease simply stops
    * being heartbeated and expires. Idempotent.
    */
  override def close(): Unit =
    writerLock.foreach(Engine.releaseWriterLock)

  /** Read-only engines: re-pin to the newest committed snapshot
    * WITHOUT a full reopen — no catalog-store reconstruction, no lock
    * churn; just the winning-body selection re-run and the served map
    * swapped atomically (a read concurrent with refresh sees the old
    * snapshot or the new one, never a mix — [[Catalog.reload]]). The
    * long-lived read-replica topology's heartbeat: a replica server
    * calls this on a timer instead of paying a full engine open per
    * poll. No-op on writer engines — a writer IS the newest state.
    */
  def refresh(): Unit = if (readOnly) catalog.reload()

  /** Reclaim UNREFERENCED copy-on-write version directories — the
    * storage half of the copy-on-write contract (every delete/update/
    * compact leaves its predecessor dir behind; without a vacuum a
    * mutation-heavy store grows without bound, ~one full column copy
    * per rewrite). Public recipe: Delta Lake's VACUUM / Iceberg's
    * expire-snapshots, reduced to this engine's two-level layout.
    *
    * A version dir `cols/<name>/v<k>` is deleted iff ALL of:
    *   - it is not the column's LIVE version (current catalog), and
    *   - no RETAINED catalog object references it (object mode keeps
    *     the last [[VersionedCatalogStore]] `Keep` commits; those are
    *     exactly the snapshots a lock-free reader could have pinned at
    *     open — every one of their referenced versions survives), and
    *   - its age exceeds `retainMs` — measured from the newest FILE in
    *     the dir, not the dir entry itself (S3A reports prefix-"dir"
    *     mtime as 0, which would void the grace): the window for
    *     readers pinned BEFORE the retained history and for bound
    *     intermediates in long-lived sessions; readers must
    *     [[refresh]] or reopen within it — the same contract Delta's
    *     VACUUM retention documents.
    * Versions ABOVE the live one (a crashed predecessor's uncommitted
    * rewrite) are garbage by the same rule: nothing references them.
    *
    * Concurrency: the catalog monitor excludes every in-process
    * mutation (all writes hold it); the writer lock/lease excludes
    * other writers. In object mode each delete is additionally FENCED
    * ([[WriterLease.checkFenced]]): it executes within one TTL of a
    * verified-ours lease read, a window in which no successor can
    * legally claim — and a paused-then-resumed vacuum self-fences at
    * its next delete instead of touching dirs a successor now owns
    * (the same staleness rule catalog commits rely on). Read-only
    * engines refuse (DBEUNSUPPORTED).
    */
  def vacuum(retainMs: Long = Engine.DefaultVacuumRetainMs): Engine.VacuumStats = {
    if (readOnly)
      throw DbError.unsupported("vacuum on a read-only engine")
    // With a retention grace the sweep runs OUTSIDE the catalog monitor:
    // holding it for the full store walk (a listing + fenced delete per
    // version dir) would stall every concurrent read on catalog.require
    // for the sweep's duration. Safety without the monitor: the live
    // snapshot below only errs toward KEEPING (a concurrent rewrite's
    // old live version stays in the snapshot), and any dir a concurrent
    // mutation creates is mtime-fresh, inside the grace. Only a
    // zero-grace sweep (tests, force-reclaim) needs mutations excluded —
    // there a just-committed dir has age 0 >= retainMs and would be
    // deletable the instant the catalog moves past it.
    if (retainMs <= 0L)
      catalog.synchronized(vacuumSweep(retainMs,
        catalog.all.map(c => c.name -> c.version).toMap))
    else
      vacuumSweep(retainMs, catalog.synchronized(
        catalog.all.map(c => c.name -> c.version).toMap))
  }

  private def vacuumSweep(retainMs: Long,
                          live: Map[String, Long]): Engine.VacuumStats = {
    {
      val fence: () => Unit = writerLock match {
        case Some(Engine.LeaseLock(_, _, lease)) => () => lease.checkFenced()
        case _ => () => ()
      }
      // object mode: a lock-free reader can be pinned to ANY snapshot
      // that was the winning body since the retained history's start —
      // the union of references across every retained object (torn ones
      // included: their readable prefix only errs safe) must survive
      val retained: Map[String, Set[Long]] = writerLock match {
        case Some(Engine.LeaseLock(_, io, _)) =>
          val dir = s"$dbDir/catalog"
          io.list(dir)
            .filter(n => VersionedCatalogStore.parseName(n).isDefined)
            .flatMap(n => io.read(s"$dir/$n").toSeq.flatMap(Catalog.versionRefs))
            .groupMapReduce(_._1)(t => Set(t._2))(_ ++ _)
        case _ => Map.empty
      }
      val root = new org.apache.hadoop.fs.Path(s"$dbDir/cols")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val now = System.currentTimeMillis()
      var deleted = 0L; var kept = 0L; var bytes = 0L
      val colDirs =
        if (fs.exists(root)) fs.listStatus(root).filter(_.isDirectory)
        else Array.empty[org.apache.hadoop.fs.FileStatus]
      val VersionDir = raw"v(\d+)".r
      colDirs.foreach { cd =>
        val name = cd.getPath.getName
        val keep: Set[Long] =
          retained.getOrElse(name, Set.empty) ++ live.get(name)
        fs.listStatus(cd.getPath).filter(_.isDirectory).foreach { vd =>
          vd.getPath.getName match {
            case VersionDir(k) if !keep(k.toLong) =>
              // age/size from the dir's FILES, one listing: object-store
              // connectors (S3A) report prefix-"directory" mtime as 0,
              // which would silently void the grace — part files carry
              // real timestamps on every store. An empty dir falls back
              // to the dir mtime (nothing to lose either way).
              val files =
                try fs.listStatus(vd.getPath).filter(_.isFile)
                catch {
                  case _: java.io.FileNotFoundException =>
                    Array.empty[org.apache.hadoop.fs.FileStatus]
                }
              val mtime =
                if (files.isEmpty) vd.getModificationTime
                else files.map(_.getModificationTime).max
              if (now - mtime >= retainMs) {
                val sz = files.map(_.getLen).sum
                // fence IMMEDIATELY before the delete — nothing slow may
                // sit between the verified-ours lease read and the
                // delete, or the "within one TTL" window argument breaks
                fence()
                if (fs.delete(vd.getPath, true)) { deleted += 1; bytes += sz }
              } else kept += 1
            case VersionDir(_) => kept += 1
            case _ => () // not a version dir — never touch
          }
        }
      }
      Engine.VacuumStats(colDirs.length, deleted, kept, bytes)
    }
  }

  def column(name: String): DataFrame =
    Storage.readColumn(spark, catalog.require(name))

  /** Engine-wide refcounts of cached plans. Spark's CacheManager keys
    * cache entries by ANALYZED-PLAN equality across the whole
    * SparkSession, so unpersist decisions must be engine-scoped: a
    * per-session check would evict a plan-equal binding cached by a
    * DIFFERENT session. Linear sameResult scan — bindings are few.
    */
  private val cachedPlans =
    scala.collection.mutable.ListBuffer.empty[(DataFrame, Int)]

  /** Columns whose live data dir is known consistent with the catalog's
    * file accounting. A crash-orphaned append (see [[Session.insertOne]])
    * can only PREDATE this process — the engine serializes its own
    * writes under `catalog.synchronized` and parquet job commits are
    * atomic — so the listing that detects one needs to run at most once
    * per column per Engine lifetime, not per append (on hdfs://-/s3a://
    * dbDirs a per-append listStatus RPC would make appends O(listing)).
    * Any fresh-version write this process performs re-establishes the
    * accounting and marks the column checked.
    *
    * This assumes ONE live writer Engine per dbDir (the reference's
    * topology too — one server process owns the store, server.c:967-1006).
    * A second concurrent Engine appending to the same dbDir could crash
    * mid-append AFTER this engine's once-per-lifetime check, leaving an
    * orphan this engine would no longer detect; interleave engines only
    * sequentially (fresh Engine per script, as GoldenChallengeSpec does),
    * never as concurrent writers.
    */
  private[core] val orphanChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[core] def registerCache(df: DataFrame): Unit = synchronized {
    val plan = df.queryExecution.analyzed
    val idx = cachedPlans.indexWhere(_._1.queryExecution.analyzed.sameResult(plan))
    if (idx >= 0) {
      val (d, n) = cachedPlans(idx); cachedPlans(idx) = (d, n + 1)
    } else {
      df.cache()
      cachedPlans += ((df, 1))
    }
  }

  private[core] def releaseCache(df: DataFrame): Unit = synchronized {
    val plan = df.queryExecution.analyzed
    val idx = cachedPlans.indexWhere(_._1.queryExecution.analyzed.sameResult(plan))
    if (idx >= 0) {
      val (d, n) = cachedPlans(idx)
      if (n <= 1) { cachedPlans.remove(idx); d.unpersist(false) }
      else cachedPlans(idx) = (d, n - 1)
    }
  }

  def newSession(): Session = new Session(this)

  /** One-shot: run a whole script in a fresh session, return output lines
    * (materialized — tests and small batch runs; the CLI consumes
    * [[Session.eval]]'s iterator directly to keep driver memory bounded).
    */
  def execute(script: String): Seq[String] = {
    val ops = Parser.parseScript(script) match {
      case Right(o)  => o
      case Left(bad) => throw DbError.parse(bad)
    }
    val s = newSession()
    // output is materialized, so the one-shot session's cached bindings
    // can be released immediately (a leaked env would pin CacheManager
    // entries for the SparkSession's lifetime)
    try ops.flatMap(op => s.eval(op).toSeq)
    finally s.dispose()
  }
}

/** Per-connection variable environment + operator evaluation. */
final class Session(val engine: Engine) {
  import engine.{spark, catalog}

  private val env = mutable.Map[String, Intermediate]()

  def get(name: String): Intermediate =
    env.getOrElse(name, throw DbError.varNotFound(name))

  def getIds(name: String): Ids = get(name) match {
    case i: Ids  => i
    case _: Vals => throw DbError.varType(s"$name is a values intermediate, need positions")
  }

  def getVals(name: String): Vals = get(name) match {
    case v: Vals => v
    case _: Ids  => throw DbError.varType(s"$name is a position intermediate, need values")
  }

  /** Rebinding destroys the old value (server.c:197-268).
    *
    * Caching policy: scripts routinely consume one variable several
    * times (the canonical query aggregates each fetch twice), so bound
    * intermediates whose size is bounded by a BASE COLUMN (select id
    * sets, fetches from selects, singletons) are cached — lazy
    * materialization, memory-and-disk LRU, dropped on rebind. Join
    * LINEAGE intermediates (pair lists and fetches from them) are NOT
    * cached: a join's output can be quadratic in its inputs, and
    * materializing 10^8 pairs costs far more than re-running the join's
    * final stage per consumer — Spark reuses the shuffle files of the
    * same DataFrame lineage across jobs, so each extra consumer pays
    * only the pair-production stage, never the scans or the shuffle.
    * (Measured at 75M pairs: caching 62s, shuffle-reuse ~1s/consumer.)
    */
  private def bind(name: String, value: Intermediate): Unit = {
    // cache/unpersist through the engine-wide registry: rebinding must
    // not evict a plan-equal binding held by this OR another session
    // (CacheManager keys by analyzed plan across the SparkSession)
    env.get(name).foreach { old =>
      if (!joinLineage(old)) engine.releaseCache(dfOf(old))
    }
    if (!joinLineage(value)) engine.registerCache(dfOf(value))
    env(name) = value
  }

  /** End-of-connection cleanup: release every cached binding this
    * session still holds and clear the environment. The reference frees
    * the session env when its connection dies (server.c:72-78); our
    * equivalent leak would be engine-refcounted cache entries pinned by
    * a dead env — long-running topologies (TcpServer) call this when the
    * client disconnects. Idempotent; the session stays usable (empty).
    */
  def dispose(): Unit = {
    env.values.foreach { v => if (!joinLineage(v)) engine.releaseCache(dfOf(v)) }
    env.clear()
  }

  /** Join-bounded intermediates are never cached (their size can be
    * quadratic in the inputs — see the policy above). That is: join
    * output lists (`ordered`), anything aligned by a join's pair order
    * (multi-column align), and rank-zip results (`pos` align) — the
    * ranks were materialized FROM the operands, so their row count is
    * the operands', which may itself be a join's pair list.
    */
  private def joinLineage(i: Intermediate): Boolean = i match {
    case ids: Ids => ids.ordered
    case v: Vals  => v.align.cols.size > 1 || v.align.cols == Seq("pos")
  }

  private def dfOf(i: Intermediate): DataFrame = i match {
    case ids: Ids  => ids.df
    case vals: Vals => vals.df
  }

  /** Evaluate one op; returns client-visible output lines (non-assign
    * forms stream results; assignments are silent). Output formats match
    * the reference client (client.c:44-128): ids one per line, values one
    * per line, tuples as `(v1,v2,...)`.
    *
    * Emission is an ITERATOR over [[org.apache.spark.sql.Dataset
    * .toLocalIterator]]: the reference streams results over the socket
    * (rpc.c:209-357) rather than buffering them, and the Spark twin of
    * that is fetching one partition at a time — driver memory is bounded
    * by the largest partition, never the full result. Side effects
    * (binds, mutations) happen eagerly in this call; only result
    * transfer is lazy. Consume (or discard) the iterator before issuing
    * an op that mutates the columns it reads.
    */
  /** Read-only enforcement lives HERE, before an op touches anything:
    * the catalog-commit seam alone is too late — Load/Insert/Delete/
    * Update write parquet into the SHARED store (appends into the live
    * dir, copy-on-write dirs at snapshotVersion+1 that can collide with
    * the live writer's) before their catalog update would be refused.
    * A denied mutation must write zero bytes. The ReadOnlyCatalogStore
    * commit-throw remains as a backstop for direct catalog callers.
    */
  private def requireWritable(): Unit =
    if (engine.readOnly)
      throw DbError.unsupported("mutation on a read-only engine")

  def eval(op: Op): Iterator[String] = op match {

    case Create(c, stype) =>
      requireWritable()
      catalog.create(c, stype); Iterator.empty

    case Load(file) =>
      requireWritable()
      evalLoad(file); Iterator.empty

    case SelectAll(assign, c)          => evalSelect(assign, c, None)
    case SelectValue(assign, c, x)     => evalSelect(assign, c, Some((x, x)))
    case SelectRange(assign, c, lo, hi) => evalSelect(assign, c, Some((lo, hi)))

    case Fetch(assign, c, posVar) =>
      val meta = catalog.require(c)
      // read from the SAME meta snapshot the checks below use — a second
      // catalog read could see a concurrent mutation and diverge from
      // the length/fusion decision
      val base = Storage.readColumn(spark, meta)
      val ids = getIds(posVar)
      val df = if (ids.ordered) ColumnOps.fetchList(base, ids.df, ids.align.cols)
               else {
                 // bitmap length must match the column (storage.c:1311-1318)
                 if (ids.srcLen.exists(_ != meta.nextId)) throw DbError.colDiffLen(c)
                 // select-all -> fetch fusion: a full select of a pristine
                 // column over an equally pristine target selects every
                 // position 0..nextId-1, so the fetch IS the base column —
                 // no join. Any delete on either column clears `pristine`
                 // and disables the fusion (live sets may then differ).
                 val fullPristine = ids.fullSelect && meta.pristine &&
                   ids.srcCol.forall(sc => catalog.require(sc).pristine)
                 if (fullPristine) base.select("id", "v")
                 else ColumnOps.fetchSet(base, ids.df)
               }
      // A fetch keeps its id set's alignment lineage only when no row of
      // the set can be dropped — i.e. the target column is pristine
      // (live set = the full position space) or the set came from a join
      // list (its ids were fetched, hence live, and fetchList preserves
      // every list row). A non-pristine set-fetch may drop tombstoned
      // positions, so two fetches from one set could diverge row-wise;
      // a fresh tag forces the rank-zip fallback (the reference's
      // k-th-value-of-each semantics) instead of a silent id-join drop.
      val keepsLineage = ids.ordered || meta.pristine
      val align = if (keepsLineage) ids.align else Align.fresh(Seq("id"))
      val vals = Vals(df, hasIds = true, align = align, fetchCol = Some(c),
        fullBase = ids.fullSelect)
      emitOrBind(assign, vals)

    case Join(jtype, varL, varR, inL, inR) =>
      val l = getVals(inL)
      val r = getVals(inR)
      if (!l.hasIds) throw DbError.varType(s"join input $inL carries no positions")
      if (!r.hasIds) throw DbError.varType(s"join input $inR carries no positions")
      if (jtype == TreeJoin) {
        val ok = r.fullBase && r.fetchCol.exists(c =>
          catalog.require(c).stype == BTree)
        if (!ok) throw DbError.noTree(inR)
      }
      val (pairs, outCols) =
        ColumnOps.join(jtype, l.df, r.df, l.align.cols, r.align.cols)
      // NOT cached — see bind(): pair lists can be quadratic; consumers
      // share the join's shuffle files instead of a materialized copy.
      // Both sides share one pair order: one fresh alignment lineage.
      val align = Align.fresh(outCols)
      bind(varL, Ids(pairs.select(outCols.map(col) :+ col("lid").as("id"): _*),
        ordered = true, align = align))
      bind(varR, Ids(pairs.select(outCols.map(col) :+ col("rid").as("id"): _*),
        ordered = true, align = align))
      Iterator.empty

    case Agg(atype, assign, input) =>
      val in = getVals(input)
      // avg empty pre-check: a memoized length answers without an action;
      // otherwise isEmpty (limit-1 job, cheaper than a count)
      if (atype == AggAvg &&
          tagLen.get(in.align.tag).fold(in.df.isEmpty)(_ == 0L))
        throw DbError.divZero()
      val out = Vals(ColumnOps.aggregate(atype, in.df), hasIds = false,
        align = Align.singleton, aggSrc = Some((atype, in.df)))
      emitOrBind(assign, out)

    case Math(mtype, assign, in1, in2) =>
      val l = getVals(in1)
      val r = getVals(in2)
      mathPreCheck(l, r, checkZeros = mtype == MathDiv)
      val (lAligned, rAligned) = aligned(l, r)
      val out = ColumnOps.math(mtype, lAligned.df, rAligned.df,
        lAligned.align.cols)
      emitOrBind(assign, Vals(out, hasIds = false, align = lAligned.align))

    case Insert(colVals) =>
      requireWritable()
      val names = colVals.map(_._1)
      names.diff(names.distinct).headOption.foreach(c => throw DbError.dupCol(c))
      colVals.foreach { case (c, v) => insertOne(c, v) }
      Iterator.empty

    case Delete(posVar, cols) =>
      requireWritable()
      val ids = idsOf(getIds(posVar))
      // delete punches holes in the position space -> pristine off;
      // the per-column rewrites overlap (independent write jobs)
      rewriteMany(cols, base =>
        base.join(ids, Seq("id"), "left_anti"), keepsPristine = false)
      Iterator.empty

    case Update(posVar, c, value) =>
      requireWritable()
      val ids = idsOf(getIds(posVar))
      // update changes values but every position stays live
      rewrite(c, base =>
        base.join(ids.withColumn("nv", lit(value)), Seq("id"), "left")
          .select(col("id"), coalesce(col("nv"), col("v")).cast(IntegerType).as("v")),
        keepsPristine = true)
      Iterator.empty

    case Op.Tuple(vars) =>
      val vals = vars.map(getVals)
      val lengths = vals.map(lengthOf)
      if (lengths.distinct.size > 1) throw DbError.intermDiffLen()
      // all-aggregate tuples fuse per shared input; same lineage -> zip
      // on the shared align key; otherwise rank-zip
      val zipped =
        if (vals.size > 1 && vals.forall(v =>
          v.align.tag == Align.SingletonTag && v.aggSrc.isDefined))
          fusedAggregates(vals)
        else vals.map(_.align.tag).distinct match {
          case Seq(_) =>
            val cols = vals.head.align.cols
            ColumnOps.tupleZip(vals.map(_.df), cols).orderBy(cols.map(col): _*)
          case _ =>
            val posed = vals.map(v =>
              ColumnOps.withPos(v.df.select((v.align.cols :+ "v").map(col): _*),
                v.align.cols.map(col)).select("pos", "v"))
            ColumnOps.tupleZip(posed, Seq("pos")).orderBy("pos")
        }
      {
        import scala.jdk.CollectionConverters._
        zipped.toLocalIterator().asScala
          .map(row => (1 to vars.size).map(i => row.getAs[Int](s"v$i"))
            .mkString("(", ",", ")"))
      }

    case Print(v) => emit(get(v))
  }

  // ---- helpers ----

  private def evalSelect(assign: Option[String], c: String,
                         bounds: Option[(Long, Long)]): Iterator[String] = {
    val meta = catalog.require(c)
    // one meta snapshot for both the srcLen recorded below and the data
    val base = Storage.readColumn(spark, meta)
    val df = bounds match {
      case None             => ColumnOps.selectAll(base)
      case Some((lo, hi)) if lo == hi => ColumnOps.selectValue(base, lo)
      case Some((lo, hi))   => ColumnOps.selectRange(base, lo, hi)
    }
    val ids = Ids(df, ordered = false, align = Align.fresh(Seq("id")),
      srcCol = Some(c), srcLen = Some(meta.nextId), fullSelect = bounds.isEmpty)
    assign match {
      case Some(v) => bind(v, ids); Iterator.empty
      case None    => emit(ids)
    }
  }

  private def emitOrBind(assign: Option[String], v: Vals): Iterator[String] =
    assign match {
      case Some(name) => bind(name, v); Iterator.empty
      case None       => emit(v)
    }

  /** Fuse a tuple of singleton aggregate results: operands whose
    * aggregates read the SAME input plan (`sameResult` on the analyzed
    * plans — e.g. `max(v)`, `min(v)`, `count(v)` of one fetch) collapse
    * into a single multi-expression `agg(...)` — one pass over the
    * input instead of one plan subtree (and one broadcast job) per
    * aggregate. Distinct inputs stay separate and cross-join 1x1.
    * Output columns are `v<k>` for operand position k (order-free — the
    * tuple formatter reads them by name).
    */
  private def fusedAggregates(vals: Seq[Vals]): DataFrame = {
    val groups = mutable.ArrayBuffer.empty[(DataFrame, mutable.ArrayBuffer[Int])]
    vals.zipWithIndex.foreach { case (v, i) =>
      val in = v.aggSrc.get._2
      groups.find { case (g, _) =>
        g.queryExecution.analyzed.sameResult(in.queryExecution.analyzed)
      } match {
        case Some((_, ix)) => ix += i
        case None          => groups += ((in, mutable.ArrayBuffer(i)))
      }
    }
    groups.map { case (in, ix) =>
      def ex(i: Int) = ColumnOps.aggExpr(vals(i).aggSrc.get._1).as(s"v${i + 1}")
      in.agg(ex(ix.head), ix.tail.toSeq.map(ex): _*)
    }.reduce(_.crossJoin(_))
  }

  /** Row counts memoized by alignment lineage: two intermediates sharing
    * a tag have the same length by construction (see [[Align]]), and an
    * intermediate reads an immutable column-version snapshot, so a count
    * computed once serves every later length check in this session — a
    * tuple of a join's two fetches pays ONE pair-production pass for its
    * length check, not one per operand. Aggregate results are singletons
    * by construction (aggregate.c:26-30): pre-seeded, never counted
    * (counting one would replay its whole input lineage).
    */
  private val tagLen = mutable.Map[Long, Long](Align.SingletonTag -> 1L)

  /** Length of a values intermediate for the DBEINTERMDIFFLEN checks. */
  private def lengthOf(v: Vals): Long =
    tagLen.getOrElseUpdate(v.align.tag, v.df.count())

  /** Math pre-checks — equal length (DBEINTERMDIFFLEN,
    * aggregate.c:112-116) and, for div, zero divisors (DBEDIVZERO) — in
    * at most ONE Spark job: the operands that genuinely need an action
    * union into a single count-by-side (+ zero-divisor sum) aggregate,
    * instead of one count job per operand. Lengths come free for
    * same-lineage operands (equal tags -> equal length) and from the
    * [[tagLen]] memo; a divisor scan memoizes its count as a side effect.
    * Length errors beat divide-by-zero, preserving the reference's check
    * order.
    */
  private def mathPreCheck(l: Vals, r: Vals, checkZeros: Boolean): Unit = {
    val sameTag = l.align.tag == r.align.tag
    val needL = !sameTag && !tagLen.contains(l.align.tag)
    val needR = (!sameTag && !tagLen.contains(r.align.tag)) || checkZeros
    var zeros = 0L
    if (needL || needR) {
      val zExpr = if (checkZeros) when(col("v") === 0, 1).otherwise(0) else lit(0)
      val sides =
        (if (needL) Seq(l.df.select(lit(0).as("side"), lit(0).as("z"))) else Nil) ++
        (if (needR) Seq(r.df.select(lit(1).as("side"), zExpr.as("z"))) else Nil)
      val row = sides.reduce(_.unionAll(_)).agg(
        coalesce(sum(when(col("side") === 0, 1L)), lit(0L)),
        coalesce(sum(when(col("side") === 1, 1L)), lit(0L)),
        coalesce(sum(col("z")), lit(0L))).head()
      if (needL) tagLen.update(l.align.tag, row.getLong(0))
      if (needR) tagLen.update(r.align.tag, row.getLong(1))
      zeros = row.getLong(2)
    }
    if (!sameTag && tagLen(l.align.tag) != tagLen(r.align.tag))
      throw DbError.intermDiffLen()
    if (zeros != 0L) throw DbError.divZero()
  }

  /** Two values intermediates, made zippable: same lineage -> as-is (the
    * align-column equi-join IS the ordinal zip); different lineages ->
    * materialize each side's ordinal rank (the only place ranks are ever
    * computed outside emission).
    */
  private def aligned(l: Vals, r: Vals): (Vals, Vals) =
    if (l.align.tag == r.align.tag) (l, r)
    else {
      def rank(v: Vals): Vals = {
        val posed = ColumnOps.withPos(
          v.df.select((v.align.cols :+ "v").map(col): _*),
          v.align.cols.map(col)).select("pos", "v")
        Vals(posed, hasIds = false, align = Align.fresh(Seq("pos")))
      }
      val lp = rank(l)
      // share the rank domain: same cols, same tag -> direct pos equi-join
      (lp, rank(r).copy(align = lp.align))
    }

  /** Stream an intermediate to the client, reference text formats:
    * ordinal order = ascending align-column order (see [[Align]]).
    *
    * `toLocalIterator` on the globally-sorted plan fetches one partition
    * per job, in partition order — a global sort range-partitions, so
    * concatenation preserves the total order while the driver holds at
    * most one partition of rows (vs `collect`'s whole-result buffer,
    * which caps printable results at `spark.driver.maxResultSize`).
    */
  private def emit(i: Intermediate): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    i match {
      case ids: Ids =>
        ids.df.orderBy(ids.align.cols.map(col): _*)
          .select("id").toLocalIterator().asScala.map(_.getLong(0).toString)
      case vals: Vals =>
        val sorted =
          if (vals.align.cols.isEmpty) vals.df
          else vals.df.orderBy(vals.align.cols.map(col): _*)
        sorted.select("v").toLocalIterator().asScala.map(_.getInt(0).toString)
    }
  }

  /** Distinct ids of a position intermediate (delete is idempotent for
    * duplicate ids, storage.c:1784-1788).
    */
  private def idsOf(ids: Ids): DataFrame = ids.df.select("id").distinct()

  /** Mutations (load/insert/delete/update) serialize on the shared
    * catalog: each one is a require -> write -> update read-modify-write
    * whose interleaving across sessions would duplicate positions or
    * clobber versions. Reads never take the lock (they work from an
    * immutable ColumnMeta snapshot). Single-op atomicity only — exactly
    * the reference's guarantee (per-column rwlocks, no transactions).
    */
  private def evalLoad(file: String): Unit = catalog.synchronized {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val parsed =
      try Storage.parseCsv(spark, file)
      catch { case scala.util.control.NonFatal(e) =>
        throw DbError.ioError(s"cannot load $file: ${e.getMessage}")
      }
    // per-column writes are independent Spark jobs — run them concurrently
    // (the scheduler interleaves their stages across executor cores; the
    // shared cached CSV scan is computed once — the first writer
    // materializes it). Catalog updates stay on this thread, after all
    // writes land. EVERYTHING after the parse sits inside the try: an
    // unknown header column (or any write failure) must still release
    // the shared scan.
    // (Probed and rejected: clamping spark.sql.files.maxPartitionBytes
    // so a 10-60 MB CSV fans across cores — the finer parse was eaten
    // by extra part files and commit overhead at every probed size;
    // LoadProbe's alternating A/B showed on >= off at 600k and 3M rows.)
    try {
      val written = parsed.cols.map { case (name, df) =>
        val meta = catalog.require(name)
        if (meta.nextId == 0L) { // double-load ignored (storage.c:1863-1867)
          Some(Future {
            val data = df.select(col("ord").as("id"), col("v"))
            val path = meta.copy(version = meta.version + 1).dataPath
            Storage.writeColumn(data, path, meta.stype,
              rowsHint = Some(parsed.rowsUpperBound))
            (name, meta.version + 1, path, Storage.partFileCount(spark, path))
          })
        } else None
      }
      val done = written.flatten.map(Await.result(_, Duration.Inf))
      if (done.nonEmpty) {
        // exact count AFTER the writes: the coalesced fast path reads it
        // driver-side off a written column's parquet footers (no job);
        // on the two-phase path the same footer read cross-checks the
        // count pass — a scan-split drift between the offset pass and
        // the write pass (e.g. a concurrent maxPartitionBytes change)
        // would drop, duplicate or misnumber rows, and must abort BEFORE
        // the catalog commit, not corrupt ids silently. Total rows alone
        // misses an equal-total boundary re-plan (overlapping offset
        // ranges), so the id column's footer max is checked too: any
        // overlap leaves max id != rows-1.
        val (written0, maxId) = Storage.parquetIdStats(spark, done.head._3)
        val rows = parsed.exactRows match {
          case None => written0
          case Some(r) =>
            if (r != written0 ||
                (r > 0 && !maxId.contains(r - 1))) throw DbError.ioError(
              s"load $file: ordinal pass counted $r rows but the write " +
                s"landed $written0 rows, max id ${maxId.getOrElse(-1L)} " +
                "(scan splits changed mid-load)")
            r
        }
        done.foreach { case (name, version, _, base) =>
          catalog.update(name, version, rows,
            baseFiles = Some(base), rowsAtVersion = Some(rows))
          engine.orphanChecked.add(name) // fresh version dir, accounted
        }
      }
    } finally parsed.scan.unpersist(false) // release the shared CSV cache
  }

  /** Delta-file count that triggers insert compaction: appends stay O(1)
    * amortized, but a long insert streak can't leave one tiny parquet
    * file per row (a million inserts = a million files = a dead
    * listing). The reference appends into its last page in place
    * (storage.c:1495-1584); folding deltas into a fresh copy-on-write
    * version is that page-append's versioned twin.
    */
  private val CompactAfterFiles = 64

  private def insertOne(c: String, v: Int): Unit = catalog.synchronized {
    val meta0 = catalog.require(c)
    if (meta0.nextId == 0L) {
      val row = spark.range(1).select(lit(0L).as("id"),
        lit(v).cast(IntegerType).as("v"))
      val path = meta0.copy(version = meta0.version + 1).dataPath
      Storage.writeColumn(row, path, meta0.stype, rowsHint = Some(1L))
      catalog.update(c, meta0.version + 1, 1L,
        baseFiles = Some(Storage.partFileCount(spark, path)),
        rowsAtVersion = Some(1L))
      engine.orphanChecked.add(c)
    } else {
      // Crash-orphan guard: an append that died before its catalog
      // advance left an uncommitted row with id == nextId in the live
      // dir. Appending another id == nextId would DUPLICATE it once
      // nextId advances, so when the dir holds more part files than the
      // catalog accounts for, fold to a fresh version first — the
      // rewrite reads only committed rows (id < nextId), dropping the
      // orphan. The listing runs once per column per Engine lifetime
      // (orphans only predate this process — see [[Engine.orphanChecked]]).
      val meta =
        if (!engine.orphanChecked.contains(c) &&
            Storage.partFileCount(spark, meta0.dataPath) != meta0.expectedFiles)
          compact(c, meta0)
        else meta0
      engine.orphanChecked.add(c)
      val row = spark.range(1).select(lit(meta.nextId).as("id"),
        lit(v).cast(IntegerType).as("v"))
      // O(1) append of a delta file; indexed layouts degrade gracefully
      // (the reference maintains its sorted projection on insert,
      // storage.c:1495-1584 — here clustering is a hint, not correctness)
      row.write.mode("append").parquet(meta.dataPath)
      val updated = catalog.update(c, meta.version, meta.nextId + 1)
      // delta count is pure row arithmetic — no listing needed
      if (updated.deltaRows >= CompactAfterFiles) compact(c, updated)
    }
  }

  /** Fold a version's deltas into a fresh copy-on-write version: ids
    * untouched, layout re-clustered for indexed types, atomic catalog
    * swap — readers of the old version dir are never broken. Reads only
    * catalog-committed rows (id < nextId), so crash-orphaned appends are
    * dropped.
    */
  private def compact(c: String, meta: ColumnMeta): ColumnMeta = {
    val path = meta.copy(version = meta.version + 1).dataPath
    Storage.writeColumn(Storage.readColumn(spark, meta), path,
      meta.stype, rowsHint = Some(meta.nextId))
    val updated = catalog.update(c, meta.version + 1, meta.nextId,
      baseFiles = Some(Storage.partFileCount(spark, path)),
      rowsAtVersion = Some(meta.nextId))
    engine.orphanChecked.add(c) // fresh version: accounting re-established
    updated
  }

  /** Copy-on-write rewrite of a column (delete/update): new version dir,
    * atomic catalog swap; ids survive untouched (storage.c:1787-1789 —
    * positions are never compacted or reused). Unsorted only, like the
    * reference (DBEUNSUPPORTED, storage.c:1833-1841).
    */
  private def rewrite(c: String, f: DataFrame => DataFrame,
                      keepsPristine: Boolean): Unit =
    rewriteMany(Seq(c), f, keepsPristine)

  /** [[rewrite]] over several columns in one operation (multi-column
    * delete): the per-column version writes are independent Spark jobs,
    * so they run concurrently — the same overlap [[evalLoad]] uses for
    * per-column load writes (guide-level: back-fill idle cores with the
    * next job's tasks instead of serializing on each write's tail).
    * Validation is up front and catalog commits happen after ALL writes
    * land, on this thread — a failed write leaves only uncommitted
    * version dirs (vacuum reclaims), never a half-advanced catalog.
    */
  private def rewriteMany(cs: Seq[String], f: DataFrame => DataFrame,
                          keepsPristine: Boolean): Unit = catalog.synchronized {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val metas = cs.map { c =>
      val meta = catalog.require(c)
      if (meta.stype != Unsorted)
        throw DbError.unsupported(s"delete/update on ${meta.stype.name} column $c")
      (c, meta)
    }
    val written = metas.map { case (c, meta) =>
      Future {
        val out = f(Storage.readColumn(spark, meta))
        // nextId over-counts tombstoned holes — fine, the hint only sizes
        // partitioning (and rewrite targets are unsorted: hint unused)
        val path = meta.copy(version = meta.version + 1).dataPath
        Storage.writeColumn(out, path, meta.stype, rowsHint = Some(meta.nextId))
        (c, meta, Storage.partFileCount(spark, path))
      }
    }
    written.map(Await.result(_, Duration.Inf)).foreach { case (c, meta, files) =>
      catalog.update(c, meta.version + 1, meta.nextId,
        stillPristine = keepsPristine,
        baseFiles = Some(files),
        rowsAtVersion = Some(meta.nextId))
      engine.orphanChecked.add(c) // fresh version dir, accounted
    }
  }
}

/** Single-writer lock machinery: the one-live-writer-per-dbDir assumption
  * (the reference's topology too — one server process owns the store,
  * /root/reference/src/server/server.c:967-1006) enforced LOUDLY instead
  * of trusted, with a mechanism per store kind:
  *
  *   - LOCAL dbDirs: an OS advisory lock on `dbDir/.graft.lock`
  *     (released automatically if the process dies).
  *   - OBJECT-STORE dbDirs (any URI scheme other than file:, or forced
  *     via `-Dgraft.store.object` for stores like NFS where advisory
  *     locks are unreliable): a [[WriterLease]] — TTL'd heartbeat
  *     object plus epoch fencing on every catalog commit. See
  *     [[StoreIO]] and SCALE.md §"Object-store commit story".
  *
  * In-process, both modes also guard a JVM-global set of dbDir keys —
  * `FileLock` is per-JVM, so without this a second same-JVM engine
  * would hit an opaque `OverlappingFileLockException` instead of the
  * engine's own error (and two same-JVM lease engines would race their
  * own heartbeats).
  */
object Engine {
  /** Outcome of a [[Engine.vacuum]] sweep: columns scanned, version
    * dirs deleted / retained, and bytes reclaimed (content size of the
    * deleted dirs, measured before deletion).
    */
  final case class VacuumStats(columns: Int, deleted: Long, kept: Long,
                               reclaimedBytes: Long)

  /** Default vacuum retention: 7 days, Delta Lake's published default —
    * long enough that any live reader snapshot or bound intermediate
    * has refreshed or died, short enough that churn is reclaimed.
    */
  val DefaultVacuumRetainMs: Long = 7L * 24 * 3600 * 1000

  private[core] sealed trait WriterLock { def key: String }
  private[core] final case class FileLock(key: String,
                                          channel: java.nio.channels.FileChannel,
                                          lock: java.nio.channels.FileLock)
      extends WriterLock
  private[core] final case class LeaseLock(key: String, io: StoreIO,
                                           lease: WriterLease)
      extends WriterLock

  private val jvmHeld = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Object mode iff the dbDir is ANY URI form (hdfs://, s3a://,
    * gs://, abfs://, and also file://) or the override property is
    * set. file:// goes through the store protocol too — not because a
    * local disk needs a lease, but because the local fast path is
    * java.nio, which parses `file:///x` as a RELATIVE path whose first
    * segment is literally `file:`; the lock and catalog would land in
    * `./file:/x` while Spark's data plane resolves the same string to
    * `/x`. HadoopStoreIO resolves every URI form consistently with the
    * data plane. Plain paths (no scheme) keep the POSIX fast path.
    */
  private[core] def isObjectStore(dbDir: String): Boolean =
    sys.props.contains("graft.store.object") ||
      // any URI scheme, single- or double-slash (Hadoop accepts both
      // `file:/x` and `file:///x`) — java.nio would parse either as a
      // relative path whose first segment is literally `scheme:`.
      // Two+ chars: every real scheme has them (s3a, gs, hdfs, file),
      // and requiring them keeps Windows drive-letter paths (`C:/x`)
      // on the local fast path instead of the lease protocol
      raw"^[A-Za-z][A-Za-z0-9+.\-]+:/.*".r.matches(dbDir)

  /** Control-plane StoreIO for an object-mode dbDir. The override is
    * the protocol-test seam: the fault-injection soak and the CAS
    * differential fuzz install wrappers (delayed visibility, torn
    * bodies, in-memory CAS) here, so the SAME engine/lease/catalog
    * code that serves production runs under an adversarial or
    * capability-shifted store. Never set outside tests.
    */
  @volatile private[graft] var storeIoOverride: Option[String => StoreIO] = None
  private[core] def storeIoFor(spark: SparkSession, dbDir: String): StoreIO =
    storeIoOverride match {
      case Some(f) => f(dbDir)
      case None =>
        new HadoopStoreIO(spark.sparkContext.hadoopConfiguration, Some(dbDir))
    }

  private def acquireWriterLock(spark: SparkSession,
                                dbDir: String): WriterLock =
    if (isObjectStore(dbDir)) {
      val key = s"uri:$dbDir"
      if (!jvmHeld.add(key)) throw DbError.locked(dbDir)
      val io = storeIoFor(spark, dbDir)
      val lease = new WriterLease(io, dbDir,
        ttlMs = sys.props.get("graft.lease.ttl.ms").flatMap(_.toLongOption)
          .getOrElse(60000L),
        settleMs = sys.props.get("graft.lease.settle.ms").flatMap(_.toLongOption)
          .getOrElse(200L))
      try lease.acquire()
      catch { case e: Throwable => jvmHeld.remove(key); throw e }
      LeaseLock(key, io, lease)
    } else {
      val dir = java.nio.file.Paths.get(dbDir)
      java.nio.file.Files.createDirectories(dir)
      val canonical = dir.toRealPath().toString
      if (!jvmHeld.add(canonical)) throw DbError.locked(dbDir)
      val channel =
        try java.nio.channels.FileChannel.open(dir.resolve(".graft.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        catch { case e: java.io.IOException =>
          jvmHeld.remove(canonical)
          throw DbError.ioError(s"cannot open lock file in $dbDir: ${e.getMessage}")
        }
      val lock =
        try channel.tryLock()
        catch { case scala.util.control.NonFatal(e) =>
          channel.close(); jvmHeld.remove(canonical)
          throw DbError.ioError(s"cannot lock $dbDir: ${e.getMessage}")
        }
      if (lock == null) { // held by another process
        channel.close(); jvmHeld.remove(canonical)
        throw DbError.locked(dbDir)
      }
      FileLock(canonical, channel, lock)
    }

  private def releaseWriterLock(wl: WriterLock): Unit =
    if (jvmHeld.remove(wl.key)) wl match {
      case FileLock(_, channel, lock) =>
        if (lock.isValid) lock.release()
        channel.close()
      case LeaseLock(_, _, lease) => lease.release()
    }
}
