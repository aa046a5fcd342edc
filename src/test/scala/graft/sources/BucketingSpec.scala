package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing (SURVEY.md §2.3 scale note): pre-partitioning both join
  * sides into the same bucket layout makes the join shuffle-free — the
  * 100 TB answer for a join repeated across many queries, where paying
  * one write-time shuffle amortizes every read-time exchange away. */
class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without an exchange") {
    import spark.implicits._
    // (tables land in the default ./spark-warehouse, gitignored;
    // warehouse.dir is a static conf and cannot move per-test)
    // one write-time shuffle each, same bucket count and key
    graft.Tables(spark, sf0001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    graft.Tables(spark, sf0001, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read bucket layout, not shuffle:
      // the only exchange allowed is the final aggregation's
      val joinRegion = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinRegion.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and results match the unbucketed join
      val expected = graft.Tables(spark, sf0001, "lineitem")
        .join(graft.Tables(spark, sf0001, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
