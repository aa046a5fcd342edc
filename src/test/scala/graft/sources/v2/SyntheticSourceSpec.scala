package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 connector contract: generated content matches the reference
  * row function, id-range filters prune the generated range at
  * partition-planning time, and column pruning reaches the reader. */
class SyntheticSourceSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: Long, parts: Int) =
    spark.read.format("graft.sources.v2.SyntheticProvider")
      .option("rows", rows).option("parts", parts).load()

  test("generated rows match the deterministic row function") {
    val got = table(100, 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1)
    assert(got.length == 100)
    got.foreach { case (id, v, l) =>
      assert(v == SyntheticTable.valOf(id) && l == SyntheticTable.labelOf(id))
    }
  }

  test("id-range filter prunes the scan range before partition planning") {
    val q = table(200000, 8).filter($"id" >= 190000 && $"id" < 195000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[190000,195000)"), s"plan:\n$plan")
    assert(q.count() == 5000)
    // exhaustive pushdown: the exact range shrink consumes the id
    // filters, so no redundant post-scan Filter remains (and aggregate
    // pushdown below a filtered scan becomes legal)
    // ("RuntimeFilters: []" in the scan line is not a Filter node)
    val p2 = q.select($"id").queryExecution.executedPlan.toString
    assert(!p2.linesIterator.exists(_.trim.matches("""[*(\d)+\- ]*Filter .*""")),
      s"plan:\n$p2")
  }

  test("ungrouped count/min/max push into the source as O(1) arithmetic") {
    val q = table(200000, 8).filter($"id" >= 50000)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SyntheticAggScan"), s"plan:\n$plan")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((150000L, 50000L, 199999L)))
    // grouped aggregates must NOT push (the source refuses): label
    // grouping falls back to the row scan + normal aggregation
    val grouped = table(1000, 2).groupBy($"label").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("SyntheticAggScan"))
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
  }

  test("LIMIT pushes into the source: only n rows are generated") {
    val q = table(200000, 8).filter($"id" >= 1000).limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[1000,1007)"), s"plan:\n$plan")
    assert(q.count() == 7)
  }

  test("ORDER BY id LIMIT n fully pushes as top-N (sort dropped)") {
    val q = table(200000, 8).orderBy($"id").limit(5).select($"id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,5)"), s"plan:\n$plan")
    assert(q.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // a DESCENDING top-N must NOT push (the reader emits ascending):
    // the range stays full and Spark's own TakeOrdered does the work
    val d = table(200000, 8).orderBy($"id".desc).limit(3).select($"id")
    val dPlan = d.queryExecution.executedPlan.toString
    assert(dPlan.contains("range=[0,200000)"), s"plan:\n$dPlan")
    assert(d.as[Long].collect().toSeq == Seq(199999L, 199998L, 199997L))
  }

  test("column pruning reaches the reader") {
    val q = table(1000, 2).select($"label")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("cols=label]"), s"plan:\n$plan")
    assert(q.distinct().count() == 7)
  }

  test("partition count follows the parts option over the pruned range") {
    val q = table(1000, 5).filter($"id" >= 800)
    // 200 remaining rows over 5 parts -> 5 partitions of 40
    assert(q.rdd.getNumPartitions == 5)
    assert(q.count() == 200)
  }
}
