package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: stage-by-stage timing of the silver JSON pipeline. */
object ProfileSilverJson {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions._
    graft.functions.DecodeTrimJson.register(spark)
    val bronze = graft.pipeline.SilverJson.bronze(spark, sfDir)
    val decoded = bronze.selectExpr("decode_trim_json(`Body`) AS body_str")
    val parsed = decoded.select(
      from_json(col("body_str"), graft.pipeline.SilverJson.payloadSchema).as("data"))
      .select(col("data.*"))
    // variant: na.drop WITHOUT the _rid nondeterministic pin (filter
    // pushes below the parse projection -> parse runs twice per row,
    // but everything stays inside WholeStageCodegen)
    val noRid = {
      val env = bronze
      env.withColumn("body_str", expr("decode_trim_json(`Body`)"))
        .select(from_json(col("body_str"),
          graft.pipeline.SilverJson.payloadSchema).as("data"))
        .select(col("data.*"))
        .na.drop(Seq("year"))
        .withColumn("year", col("year").cast("int"))
        .withColumn("month", col("month").cast("int"))
        .withColumn("arr_flights", col("arr_flights").cast("double"))
        .withColumn("arr_del15", col("arr_del15").cast("double"))
        .withColumn("arr_delay", col("arr_delay").cast("double"))
        .withColumn("produced_at", col("produced_at").cast("bigint"))
    }
    // variant: filter + cast on the UNFLATTENED struct — from_json is
    // evaluated exactly once per row (one projection output column);
    // the flatten happens above the filter as cheap GetStructField
    val structFilter = {
      bronze
        .withColumn("body_str", expr("decode_trim_json(`Body`)"))
        .select(from_json(col("body_str"),
          graft.pipeline.SilverJson.payloadSchema).as("data"),
          monotonically_increasing_id().as("_rid"))
        .filter(col("data.year").isNotNull)
        .select(
          col("data.year").cast("int").as("year"),
          col("data.month").cast("int").as("month"),
          col("data.carrier").as("carrier"),
          col("data.airport").as("airport"),
          col("data.arr_flights").cast("double").as("arr_flights"),
          col("data.arr_del15").cast("double").as("arr_del15"),
          col("data.arr_delay").cast("double").as("arr_delay"),
          col("data.produced_at").cast("bigint").as("produced_at"))
    }
    println("==== PLAN parse+cast nofilter ====")
    parsed.explain("formatted")
    println("==== PLAN struct-filter ====")
    structFilter.explain("formatted")
    for (i <- 1 to 2) {
      time(s"bronze (to_json+corrupt) $i") { noop(bronze) }
      time(s"decode only $i") { noop(decoded) }
      time(s"decode+from_json $i") { noop(parsed) }
      time(s"silver no-rid $i") { noop(noRid) }
      time(s"silver struct-filter $i") { noop(structFilter) }
      time(s"parse+cast nofilter $i") {
        noop(parsed
          .withColumn("year", col("year").cast("int"))
          .withColumn("month", col("month").cast("int"))
          .withColumn("arr_flights", col("arr_flights").cast("double"))
          .withColumn("arr_del15", col("arr_del15").cast("double"))
          .withColumn("arr_delay", col("arr_delay").cast("double"))
          .withColumn("produced_at", col("produced_at").cast("bigint")))
      }
      time(s"parse+filter nocast $i") {
        noop(decoded.select(
          from_json(col("body_str"), graft.pipeline.SilverJson.payloadSchema).as("data"),
          monotonically_increasing_id().as("_rid"))
          .filter(col("data.year").isNotNull)
          .select(col("data.*")))
      }
      time(s"silver no-order $i") { noop(graft.pipeline.SilverJson.silver(spark, sfDir)) }
      time(s"silver ordered $i") { noop(graft.pipeline.SilverJson.silverQuery(spark, sfDir)) }
    }
    spark.stop()
  }
}
