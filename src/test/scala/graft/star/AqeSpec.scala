package graft.star

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Adaptive Query Execution gates: SCALE.md leans on AQE for runtime
  * re-planning (join demotion to broadcast, post-shuffle coalescing) —
  * assert those actually fire rather than assuming. */
class AqeSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // the action must run through THIS Dataset's QueryExecution — AQE
    // re-plans during execution, so the adaptive plan is only final
    // (isFinalPlan=true) on the executed instance
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE converts a static sort-merge join to broadcast at runtime") {
    import spark.implicits._
    // static planning sees no size estimate below the (disabled)
    // broadcast threshold, so the initial plan is a shuffle join; AQE
    // measures the built shuffle (tiny nation table) and re-plans to a
    // broadcast hash join — the runtime protection SCALE.md cites for
    // dimension joins whose pre-filter selectivity static stats miss
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1MB") {
      val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      val nat = spark.read.parquet(s"$sf0001/nation.parquet")
      val j = cust.join(nat, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").count()
      val p = finalPlan(j)
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("AQE coalesces undersized post-shuffle partitions") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64") {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val agg = li.groupBy($"l_returnflag").count()
      val p = finalPlan(agg)
      // the 64 requested reducers collapse to a handful for ~6k rows
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"), p)
    }
  }
}
