package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Star-schema table loaders over the driver's parquet test data
  * (SURVEY.md §2.1 S10, TESTDATA.md).
  *
  * Scale posture: `spark.read.parquet` is a v2 FileScan — partition
  * discovery, column pruning and filter pushdown are handled by
  * Catalyst, so every downstream operator in this library composes a
  * declarative plan on top of a prunable columnar scan. At 100 TB the
  * same call reads a directory of thousands of files; nothing here
  * assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else fanOut(spark, spark.read.parquet(s"$dir/$name.parquet"))

  /** The harness parquet files are written as ONE row group each, so a
    * raw scan is a single task and every downstream map pipeline runs
    * single-threaded. A real lake has thousands of splits and never hits
    * this; for the harness layout we repartition IFF the scan yields
    * fewer partitions than cores (at scale `scanParts >= cores`, so this
    * is a no-op there — no extra shuffle). Column pruning and the
    * decimal-exact aggregates are unaffected by the round-robin
    * exchange. */
  private def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert to
    * a microsecond TIMESTAMP_NTZ (truncation — identical to DuckDB's
    * ns->us read), keeping the session-TZ-independent semantics. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fanOut(spark, spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
