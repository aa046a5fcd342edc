package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-level incremental materialization (round 3) — the
  * lakehouse answer to "don't recompute the world": a derived table
  * partitioned on some grain (here a month key) is refreshed by
  * (1) fingerprinting every SOURCE partition in one scan,
  * (2) diffing fingerprints against the manifest persisted by the last
  * run, and (3) recomputing + dynamically overwriting ONLY the stale
  * partitions. The reference rebuilds gold with a full overwrite
  * (ipynb:1297-1303); at 100 TB a late-arriving correction to one month
  * must cost one month, not the table.
  *
  * Fingerprints are order-independent (bit_xor of per-row xxhash64 +
  * row count), so partitioning/parallelism can never fake a change.
  * The stale-partition list is collected to the driver — that is
  * partition METADATA (bounded by |partition values|), not data, the
  * same cardinality any metastore operation handles. The manifest
  * commit is a staged swap like [[Merge]] — same documented
  * non-atomicity gap that transactional table formats close.
  */
object Incremental {

  private def fingerprints(source: DataFrame, partCol: String): DataFrame = {
    val h = source.columns.sorted.map(c => s"`$c`").mkString(", ")
    source.groupBy(col(partCol).cast("string").as("part"))
      .agg(
        expr(s"bit_xor(xxhash64($h))").as("fp"),
        count(lit(1)).as("n"))
  }

  /** Refresh `path` (parquet partitioned by `partCol`) from `source`
    * via `derive` (which must emit `partCol`). Returns the partition
    * values recomputed this run (empty = everything was fresh). */
  def refresh(spark: SparkSession, source: DataFrame, partCol: String,
      derive: DataFrame => DataFrame, path: String): Seq[String] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = s"$path.__manifest"
    val cur = fingerprints(source, partCol)
    val stale: Seq[String] =
      if (!fs.exists(new Path(manifest)))
        cur.select("part").collect().map(_.getString(0)).toSeq
      else {
        val prev = spark.read.parquet(manifest)
          .select(col("part"), col("fp").as("p_fp"), col("n").as("p_n"))
        cur.join(prev, Seq("part"), "left")
          .filter(col("p_fp").isNull ||
            col("fp") =!= col("p_fp") || col("n") =!= col("p_n"))
          .select("part").collect().map(_.getString(0)).toSeq
      }
    if (stale.nonEmpty) {
      derive(source.filter(col(partCol).cast("string").isin(stale: _*)))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy(partCol)
        .parquet(path)
      val staged = s"$manifest.__staged"
      cur.coalesce(1).write.mode("overwrite").parquet(staged)
      if (fs.exists(new Path(manifest)))
        fs.delete(new Path(manifest), true)
      fs.rename(new Path(staged), new Path(manifest))
    }
    stale
  }
}
