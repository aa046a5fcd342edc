package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style keyed upsert over plain parquet (SURVEY.md §2.1 S7
  * extension): the reference refreshes gold with `mode("overwrite")`
  * (full recompute, ipynb:1297-1303); at 100 TB gold must instead absorb
  * increments. On a transactional format (Delta/Iceberg) this is
  * `MERGE INTO`; this emulation gives the same converging semantics on
  * bare parquet:
  *
  *   matched keys    -> replaced by the update row
  *   unmatched keys  -> inserted
  *   absent from upd -> carried over unchanged
  *
  * Idempotent: re-applying the same update batch is a no-op, so
  * at-least-once delivery upstream converges (same contract as the
  * streaming goldSink).
  *
  * Scale posture: one full-outer join on the merge keys (shuffle both
  * sides once) + a staged rewrite. The staged-swap commit is NOT atomic
  * under concurrent readers — that is precisely the gap table formats
  * close with a transaction log; the dataflow above them is identical.
  */
object Merge {

  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new Path(path))
    val merged =
      if (!exists) updates
      else {
        val target = spark.read.parquet(path)
        val u = updates.columns.foldLeft(updates)((d, c) =>
          d.withColumnRenamed(c, s"__u_$c"))
        val cond = keys.map(k => target(k) === u(s"__u_$k")).reduce(_ && _)
        val matched = u(s"__u_${keys.head}").isNotNull
        target.join(u, cond, "full_outer")
          .select(target.columns.toIndexedSeq.map { c =>
            when(matched, u(s"__u_$c")).otherwise(target(c)).as(c)
          }: _*)
      }
    val staged = s"$path.__staged"
    merged.write.mode("overwrite").parquet(staged)
    if (exists) fs.delete(new Path(path), true)
    fs.rename(new Path(staged), new Path(path))
  }

  /** Targeted erasure (the GDPR delete) over a `partCol`-partitioned
    * parquet target: remove every row whose `keyCol` is in `keys`,
    * rewriting ONLY the partitions that contain such rows — untouched
    * partitions keep their exact files (asserted by mtime in
    * MergeSpec). Returns the affected partition values.
    *
    * Mechanics: survivors of the hit partitions are materialized
    * (localCheckpoint) BEFORE the overwrite — a lazy plan would read
    * the very files the dynamic overwrite replaces; a partition whose
    * every row is erased produces no survivor row, which dynamic
    * overwrite would silently skip, so emptied partitions are removed
    * explicitly.
    *
    * Scale posture: the erase cost is proportional to the partitions
    * the keys live in, never the table — with a key-clustered layout
    * (z-order/bucketing) that is a handful of files per subject. Table
    * formats add a transaction log and deletion vectors on top; the
    * partition-targeted dataflow is the same. */
  def deleteKeys(spark: SparkSession, path: String, partCol: String,
      keyCol: String, keys: Seq[Any],
      maxParts: Int = Incremental.MaxDriverParts): Seq[String] = {
    val target = spark.read.parquet(path)
    // hit partitions stay a DataFrame for the data path (broadcast
    // semi-join); driver only ever sees the bounded NAME list it needs
    // for the filesystem deletes below. `keys` itself is caller-provided
    // (a GDPR request batch), inherently driver-sized.
    val hitDf = target.filter(col(keyCol).isin(keys: _*))
      .select(col(partCol).cast("string")).distinct()
    val hit = Incremental.collectParts(hitDf, maxParts)
    if (hit.isEmpty) return Nil
    val survivors = Incremental
      .semiRestrict(target, col(partCol).cast("string"), hitDf)
      .filter(!col(keyCol).isin(keys: _*))
      .localCheckpoint()
    // emptied = hit partitions with no survivor row; dynamic overwrite
    // silently skips them, so they are removed explicitly. Computed
    // distributed, collected bounded (⊆ hit) — and BEFORE the overwrite,
    // while hitDf's lazy plan still reads the pre-delete files.
    val emptied = Incremental.collectParts(
      hitDf.toDF("p").except(
        survivors.select(col(partCol).cast("string").as("p"))), maxParts)
    survivors.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- emptied)
      fs.delete(new Path(s"$path/$partCol=$p"), true)
    hit
  }
}
