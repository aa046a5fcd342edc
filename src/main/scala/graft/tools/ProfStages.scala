package graft.tools
import org.apache.spark.sql.SparkSession
object ProfStages {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${reps.min}%.2f med=${reps.sorted.apply(1)}%.2f")
    }
    import graft.llm.Similarity
    // warm
    Similarity.lofOutliers(spark, dir).write.format("noop").mode("overwrite").save()
    t("autoKCentroids") { Similarity.autoKCentroids(spark, dir).write.format("noop").mode("overwrite").save() }
    t("autoKAssign") { Similarity.autoKAssign(spark, dir).write.format("noop").mode("overwrite").save() }
    t("knnGraphAutoK") { Similarity.knnGraphAutoK(spark, dir).write.format("noop").mode("overwrite").save() }
    t("lofOutliers") { Similarity.lofOutliers(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
