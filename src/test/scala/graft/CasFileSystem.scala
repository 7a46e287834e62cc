package graft

import java.net.URI

import org.apache.hadoop.fs.{CommonPathCapabilities, CreateFlag, EtagSource,
  FSDataOutputStream, FSDataOutputStreamBuilder, FileAlreadyExistsException,
  FileStatus, Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem that behaves like an object-store
  * connector with conditional writes — the positive target for
  * [[graft.core.HadoopCas.probe]]'s behavioral certification, which
  * otherwise could only ever be exercised in the refusing direction
  * (local/HDFS have no ETags). It layers onto RawLocalFileSystem:
  *
  *   - `fs.capability.etags.available` advertised; `getFileStatus`
  *     carries a content-addressed ETag (md5 of the bytes — every
  *     probe/lease write in the suite has a distinct body, so
  *     content-addressing is a faithful stand-in for version ETags).
  *   - `createFile()` honors the HADOOP-19256 conditional options:
  *     `fs.option.create.conditional.overwrite` with polarity
  *     flag=false -> create only if absent (the probe must CALIBRATE
  *     this, never assume it), and
  *     `fs.option.create.conditional.overwrite.etag` -> replace only
  *     if the current content's ETag matches.
  *
  * Checks happen at `build()` (single-JVM tests need no close-time
  * atomicity); a real connector enforces them at the PUT. Registered
  * per-conf via [[CasFileSystem.install]].
  */
class CasFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "casfs"
  override def getUri: URI = URI.create("casfs:///")

  /** The flag value meaning "create only if absent" — overridden by
    * [[CasFileSystemInverted]] to prove the probe CALIBRATES the
    * polarity instead of assuming one.
    */
  private[graft] def ifAbsentPolarity: Boolean = false

  /** Whether `fs.option.create.conditional.overwrite` is enforced —
    * [[CasFileSystemSwallowCond]] turns it off (the key is silently
    * ACCEPTED but ignored) to model the connector the probe must not
    * mis-certify off plain no-overwrite refusals.
    */
  private[graft] def honorsCondOverwrite: Boolean = true

  private[graft] def contentEtag(f: Path): Option[String] =
    try {
      // read the backing file directly: FileSystem.open() consults
      // getFileStatus, which is where this is called FROM
      val bytes = java.nio.file.Files.readAllBytes(pathToFile(f).toPath)
      val md = java.security.MessageDigest.getInstance("MD5")
      Some(md.digest(bytes).map("%02x".format(_)).mkString)
    } catch { case _: java.io.IOException => None }

  override def getFileStatus(f: Path): FileStatus = {
    val st = super.getFileStatus(f)
    if (st.isFile)
      contentEtag(f).map(new CasFileStatus(st, _)).getOrElse(st)
    else st
  }

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == CommonPathCapabilities.ETAGS_AVAILABLE ||
      super.hasPathCapability(path, capability)

  override def createFile(path: Path): FSDataOutputStreamBuilder[_, _] =
    new CasFileSystem.CasBuilder(this, path)
}

// field-by-field, NOT the copy constructor: RawLocal's lazy status
// loads permissions via `new java.io.File(uri)`, which rejects casfs://
private class CasFileStatus(st: FileStatus, etag: String)
    extends FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, st.getPath) with EtagSource {
  override def getEtag: String = etag
}

/** [[CasFileSystem]] with the OPPOSITE existence-flag polarity —
  * `true` means create-only-if-absent here. A probe that hardcoded
  * either reading would mis-certify one of the two.
  */
class CasFileSystemInverted extends CasFileSystem {
  override private[graft] def ifAbsentPolarity: Boolean = true
}

/** A connector that SWALLOWS the existence-precondition key (accepted
  * as a mandatory option but never enforced) while honoring ETag
  * preconditions and defaulting plain creates to no-overwrite. A probe
  * that doesn't force `overwrite(true)` on its drill writes sees
  * create-over-existing refuse here — NON-ATOMIC check-then-put, not a
  * conditional PUT — and would certify a createIfAbsent with no
  * atomicity behind it. The probe must return None for this store.
  */
class CasFileSystemSwallowCond extends CasFileSystem {
  override private[graft] def honorsCondOverwrite: Boolean = false
}

object CasFileSystem {
  import graft.core.HadoopCas.{CondOverwrite, CondOverwriteEtag}

  /** Register the scheme on a Hadoop conf (fresh instances, no cache —
    * tests mutate honoring behavior via subclasses).
    */
  def install(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.set("fs.casfs.impl", classOf[CasFileSystem].getName)
    conf.set("fs.casfs.impl.disable.cache", "true")
  }

  private final class CasBuilder(cfs: CasFileSystem, p: Path)
      extends FSDataOutputStreamBuilder[FSDataOutputStream, CasBuilder](cfs, p) {
    override def getThisBuilder: CasBuilder = this
    override def build(): FSDataOutputStream = {
      val mand = getMandatoryKeys
      rejectUnknownMandatoryKeys(
        java.util.Arrays.asList(CondOverwrite, CondOverwriteEtag),
        " for casfs conditional create")
      val exists = cfs.exists(getPath)
      if (mand.contains(CondOverwrite) && cfs.honorsCondOverwrite) {
        val flag =
          getOptions.getBoolean(CondOverwrite, !cfs.ifAbsentPolarity)
        if (flag == cfs.ifAbsentPolarity && exists)
          throw new FileAlreadyExistsException(
            s"casfs: conditional create, object exists: $getPath")
      }
      if (mand.contains(CondOverwriteEtag)) {
        val want = getOptions.get(CondOverwriteEtag)
        val have = if (exists) cfs.contentEtag(getPath) else None
        if (!have.contains(want))
          throw new java.io.IOException(
            s"casfs: ETag precondition failed for $getPath " +
              s"(want $want, have ${have.orNull})")
      } else if (!(mand.contains(CondOverwrite) && cfs.honorsCondOverwrite)
          && exists && !getFlags.contains(CreateFlag.OVERWRITE))
        // plain create semantics when no ENFORCED precondition applies:
        // no-overwrite by default, like a builder that wasn't given
        // overwrite(true) — the non-atomic refusal the probe's
        // calibration must never mistake for conditional enforcement
        throw new FileAlreadyExistsException(
          s"casfs: plain create, object exists: $getPath")
      cfs.create(getPath, true)
    }
  }
}
