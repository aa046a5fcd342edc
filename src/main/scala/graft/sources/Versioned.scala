package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time travel (SURVEY.md §2.1 S7
  * extension) — the smallest useful slice of what Delta/Iceberg table
  * formats provide over a plain parquet sink:
  *
  *  - every write is a NEW immutable snapshot directory (`v=N/`),
  *    committed by atomically moving a `_VERSION_N` manifest marker
  *    into place LAST — readers either see a complete version or not
  *    at all (the same commit discipline as `Merge`'s staged swap);
  *  - `read(root)` resolves the latest committed version at plan time;
  *    `read(root, Some(n))` time-travels to any retained snapshot;
  *  - `rollback(n)` is a METADATA operation: it commits a new version
  *    whose manifest points at version n's data — no data rewrite, and
  *    the botched version stays readable for forensics.
  *
  * Scale posture: snapshots are directory pointers, so time travel
  * costs nothing at read time (the scan is an ordinary pruned parquet
  * read of one directory); what a real table format adds on top is
  * file-level manifests (partial-commit granularity) and compaction of
  * the version history — the read/commit semantics are the same.
  */
object Versioned {

  private def manifest(root: String) = Paths.get(root, "_LATEST")

  /** Highest committed version, or None for an empty root. */
  def latestVersion(root: String): Option[Long] = {
    val m = manifest(root)
    if (Files.exists(m))
      Some(new String(Files.readAllBytes(m), "UTF-8").trim.toLong)
    else None
  }

  /** Directory that holds `version`'s data — following rollback
    * pointers one level (a rollback manifest stores the target dir). */
  private def dataDir(root: String, version: Long): String = {
    val ptr = Paths.get(root, s"v=$version", "_POINTS_AT")
    if (Files.exists(ptr))
      new String(Files.readAllBytes(ptr), "UTF-8").trim
    else s"$root/v=$version"
  }

  /** Commit `df` as the next version; returns the new version number.
    *
    * Schema enforcement (the `overwriteSchema` contract of
    * transactional table formats, reference ipynb:1297-1303): by
    * default a commit whose schema differs from the current version is
    * REFUSED — silent schema drift is how a typo'd column becomes a
    * production outage. Passing `overwriteSchema = true` evolves the
    * table: the new snapshot carries the new schema, while every
    * retained older version keeps its own (each snapshot's parquet
    * footers are self-describing), so time travel across the evolution
    * boundary reads each era with the schema it was written under. */
  /** Optimistic-concurrency conflict: the table advanced past the
    * version the writer read — the transactional-format contract that
    * keeps two concurrent jobs from silently overwriting each other. */
  final class VersionConflictException(msg: String)
    extends RuntimeException(msg)

  def write(df: DataFrame, root: String,
      overwriteSchema: Boolean = false,
      expectedVersion: Option[Long] = None): Long = {
    val cur0 = latestVersion(root)
    expectedVersion.foreach { exp =>
      if (cur0 != Some(exp))
        throw new VersionConflictException(
          s"optimistic commit conflict: expected table at version $exp " +
            s"but found ${cur0.fold("empty")(_.toString)} — re-read and retry")
    }
    val next = cur0.map(_ + 1).getOrElse(0L)
    if (!overwriteSchema) {
      latestVersion(root).foreach { cur =>
        val existing = df.sparkSession.read.parquet(dataDir(root, cur)).schema
        // compare (name, type) shape only: parquet read-back is always
        // nullable, so strict StructType equality would reject every
        // in-memory frame with non-null columns
        def shape(s: org.apache.spark.sql.types.StructType) =
          s.fields.map(f => (f.name, f.dataType)).toSeq
        require(shape(existing) == shape(df.schema),
          s"schema change rejected (overwriteSchema=false): table has " +
            s"${existing.simpleString} but the write carries " +
            s"${df.schema.simpleString}")
      }
    }
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    commit(root, next)
    next
  }

  /** Roll back to `version` as a new commit (metadata-only). */
  def rollback(root: String, version: Long): Long = {
    val next = latestVersion(root)
      .getOrElse(throw new IllegalStateException("empty table")) + 1
    val dir = Paths.get(root, s"v=$next")
    Files.createDirectories(dir)
    Files.write(dir.resolve("_POINTS_AT"),
      dataDir(root, version).getBytes("UTF-8"))
    commit(root, next)
    next
  }

  /** Read the latest committed version, or time-travel to `asOf`. */
  def read(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(root))
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    spark.read.parquet(dataDir(root, v))
  }

  /** Expire history: physically delete snapshot directories older than
    * the last `keepLast` versions — the retention/VACUUM maintenance a
    * real table format schedules. REFERENCE-AWARE: a retained rollback
    * commit is only a pointer at an older version's data, so the
    * pointed-at directory survives expiration even when its own
    * version number is out of the retention window (deleting it would
    * corrupt the CURRENT table). Returns the versions whose data was
    * deleted; time travel to them now fails, reads of every retained
    * version are untouched (asserted in VersionedSpec).
    *
    * Scale posture: pure manifest/directory metadata work — cost ∝
    * |expired versions|, independent of data volume. */
  def expire(root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(root).getOrElse(return Seq.empty)
    val oldestKept = math.max(0L, latest - keepLast + 1)
    val referenced = (oldestKept to latest).map(v => dataDir(root, v)).toSet
    val deleted = (0L until oldestKept).filter { v =>
      val dir = Paths.get(root, s"v=$v")
      Files.exists(dir) && !referenced.contains(s"$root/v=$v")
    }
    deleted.foreach { v =>
      val dir = Paths.get(root, s"v=$v")
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    deleted
  }

  /** Atomic publish: write the manifest beside its target, then MOVE it
    * into place (same-directory move = atomic on POSIX). */
  private def commit(root: String, version: Long): Unit = {
    val tmp = Paths.get(root, s"_LATEST.tmp.$version")
    Files.write(tmp, version.toString.getBytes("UTF-8"))
    Files.move(tmp, manifest(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
