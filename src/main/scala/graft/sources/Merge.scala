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
}
