package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print each test table's schema as Spark sees it and a
  * sample row — keeps engine/oracle type parity honest (e.g. the ns
  * parquet timestamps in `events`). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.names) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    spark.read.parquet(s"$dir/events.parquet").show(2, false)
    spark.stop()
  }
}
