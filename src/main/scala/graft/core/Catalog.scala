package graft.core

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._
import graft.lang.Op.StorageType

/** Durable column catalog for a database directory.
  *
  * The engine's only persistent objects are named integer columns
  * (reference data model: /root/reference/src/server/include/storage.h:21-47 —
  * "tables" are a client naming convention). Each column lives at
  * `dbDir/cols/<name>/v<version>/` as parquet `(id: long, v: int)`;
  * `dbDir/catalog.txt` holds one record per column. Mutations write a new
  * version directory then atomically swap the catalog (copy-on-write), so
  * concurrent readers of the old version are never broken and a crash
  * mid-rewrite leaves the previous version live.
  *
  * `nextId` mirrors the reference's `cd_nexttupleid` (storage.h:23-24):
  * positions are dense at load, stable under delete (tombstoned ids are
  * never reused), and independent per column.
  */
/** `baseFiles` — parquet part-file count right after the version's full
  * write; insert compaction triggers on the DELTA beyond it (a large
  * column legitimately writes many base part files, and counting them
  * against the threshold would re-compact on every insert).
  */
final case class ColumnMeta(dbDir: String, name: String, stype: StorageType,
                            version: Long, nextId: Long,
                            pristine: Boolean = true,
                            baseFiles: Long = 1L) {
  def dataPath: String = s"$dbDir/cols/$name/v$version"
}

final class Catalog(val dbDir: String) {

  private val catalogFile: Path = Paths.get(dbDir, "catalog.txt")
  private var cols: Map[String, ColumnMeta] = load()

  private def load(): Map[String, ColumnMeta] = {
    Files.createDirectories(Paths.get(dbDir, "cols"))
    if (!Files.exists(catalogFile)) Map.empty
    else Files.readAllLines(catalogFile).asScala.filter(_.nonEmpty).map { line =>
      // 4-field records predate the pristine flag; they may have seen
      // deletes, so read them conservatively as non-pristine
      val fields = line.split("\t")
      val Array(n, st, ver, nid) = fields.take(4)
      val pristine = fields.length > 4 && fields(4) == "1"
      // 5-field records predate baseFiles; 1 (the minimum full write) is
      // the conservative default — compaction may fire one insert early
      val baseFiles = fields.lift(5).flatMap(_.toLongOption).getOrElse(1L)
      val stype = StorageType.fromString(st).getOrElse(
        throw DbError.ioError(s"bad storage type $st in catalog"))
      n -> ColumnMeta(dbDir, n, stype, ver.toLong, nid.toLong, pristine, baseFiles)
    }.toMap
  }

  private def persist(): Unit = {
    val tmp = Paths.get(dbDir, "catalog.txt.tmp")
    val body = cols.values.toSeq.sortBy(_.name)
      .map(c => s"${c.name}\t${c.stype.name}\t${c.version}\t${c.nextId}\t${if (c.pristine) "1" else "0"}\t${c.baseFiles}")
      .mkString("", "\n", "\n")
    Files.writeString(tmp, body)
    Files.move(tmp, catalogFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def get(name: String): Option[ColumnMeta] = synchronized { cols.get(name) }

  def require(name: String): ColumnMeta =
    get(name).getOrElse(throw DbError.colSelect(name))

  def exists(name: String): Boolean = synchronized { cols.contains(name) }

  def all: Seq[ColumnMeta] = synchronized { cols.values.toSeq.sortBy(_.name) }

  /** Register a new empty column; idempotent if it already exists
    * (reference tolerates re-create of a loaded column).
    */
  def create(name: String, stype: StorageType): ColumnMeta = synchronized {
    cols.get(name) match {
      case Some(m) => m
      case None =>
        val m = ColumnMeta(dbDir, name, stype, 0L, 0L)
        cols += name -> m
        persist()
        m
    }
  }

  /** Record a new data version and/or advanced nextId for `name`.
    * `stillPristine = false` marks the column as mutated (delete/update
    * may have punched holes) — engine rewrite paths set it; load/insert
    * keep the flag.
    */
  def update(name: String, version: Long, nextId: Long,
             stillPristine: Boolean = true,
             baseFiles: Option[Long] = None): ColumnMeta = synchronized {
    val prev = cols.getOrElse(name, throw DbError.colSelect(name))
    val m = prev.copy(version = version, nextId = nextId,
      pristine = prev.pristine && stillPristine,
      baseFiles = baseFiles.getOrElse(prev.baseFiles))
    cols += name -> m
    persist()
    m
  }
}
