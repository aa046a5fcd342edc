package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Catalog-managed tables and plan-level cache reuse — the serving-layer
  * mechanics between ad-hoc frames and a real metastore. */
class CatalogSpec extends SparkSpec {

  test("saveAsTable round trip: managed table, catalog metadata, insertInto") {
    import spark.implicits._
    dropWithLocation("gold_carrier_tbl")
    Seq(("YV", 10L), ("AA", 20L)).toDF("carrier", "n")
      .write.mode("overwrite").saveAsTable("gold_carrier_tbl")
    // catalog knows the table and its schema
    assert(spark.catalog.tableExists("gold_carrier_tbl"))
    val cols = spark.catalog.listColumns("gold_carrier_tbl")
      .collect().map(_.name).toSet
    assert(cols == Set("carrier", "n"))
    // append through the catalog path, then read back by name
    Seq(("ZZ", 5L)).toDF("carrier", "n")
      .write.mode("append").saveAsTable("gold_carrier_tbl")
    val back = spark.table("gold_carrier_tbl")
      .as[(String, Long)].collect().toSet
    assert(back == Set(("YV", 10L), ("AA", 20L), ("ZZ", 5L)))
    spark.sql("DROP TABLE gold_carrier_tbl")
  }

  private def dropWithLocation(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables across JVMs but their
    // managed locations survive — clear both so reruns are hermetic
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("ANALYZE TABLE feeds row-count statistics into the optimizer") {
    import spark.implicits._
    dropWithLocation("stats_tbl")
    (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.saveAsTable("stats_tbl")
    spark.sql("ANALYZE TABLE stats_tbl COMPUTE STATISTICS")
    // rowCount surfaces in plan stats only under CBO; without it the
    // planner falls back to a file-size guess
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("stats_tbl")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(500)), stats.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    spark.sql("DROP TABLE stats_tbl")
  }

  test("persisted frame serves later actions from InMemoryTableScan") {
    // the reuse-a-partitioning story: an aggregate consumed by several
    // downstream queries pays its shuffle once when persisted
    import spark.implicits._
    val agg = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .persist()
    try {
      agg.count() // materialize
      val p = agg.filter($"n" > 0).queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), p)
      // and the cached plan carries no new exchange for the same keys
      val reagg = agg.groupBy($"l_returnflag").agg(sum($"n"))
        .queryExecution.executedPlan.toString
      assert(reagg.contains("InMemoryTableScan"), reagg)
    } finally agg.unpersist()
  }
}
