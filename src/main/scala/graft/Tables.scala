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

  /** `events.ts` arrives in two physical encodings depending on the
    * producer: parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as long — or a plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark reads
    * natively as TIMESTAMP_NTZ. Normalize BOTH to microsecond
    * TIMESTAMP_NTZ here so every downstream operator sees one
    * session-TZ-independent type (nanos path truncates — identical to
    * DuckDB's ns->us read). */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case LongType => expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case TimestampNTZType => col("ts")
      case _ => expr("cast(ts as timestamp_ntz)")
    }
    fanOut(spark, raw.withColumn("ts", ts))
  }
}
