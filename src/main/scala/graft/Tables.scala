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
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert to
    * a microsecond TIMESTAMP_NTZ (truncation — identical to DuckDB's
    * ns->us read), keeping the session-TZ-independent semantics. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
