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
    val bronze = graft.pipeline.SilverJson.bronze(spark, sfDir)
    for (i <- 1 to 2) {
      time(s"bronze (to_json+corrupt) $i") { noop(bronze) }
      time(s"silver no-order $i") { noop(graft.pipeline.SilverJson.silver(spark, sfDir)) }
      time(s"silver ordered $i") { noop(graft.pipeline.SilverJson.silverQuery(spark, sfDir)) }
    }
    spark.stop()
  }
}
