package graft.star

import graft.SparkSpec

/** Plan-shape gate (SURVEY.md §4): the physical plans the 100 TB story
  * depends on, asserted so regressions surface as test failures rather
  * than silent slowdowns. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("broadcast dimension join compiles to BroadcastHashJoin") {
    assert(plan("join_broadcast_dim").contains("BroadcastHashJoin"))
  }

  test("range join broadcasts the 50-row side (no cartesian shuffle)") {
    val p = plan("join_range")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("global top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("rollup/cube aggregate through Expand under partial aggregation") {
    assert(plan("agg_rollup").contains("Expand"))
    assert(plan("agg_cube").contains("Expand"))
  }

  test("gold aggregates are partial+final hash aggregates") {
    val p = plan("gold_carrier")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("semi and anti joins use the dedicated join types") {
    assert(plan("join_semi").toLowerCase.contains("leftsemi"))
    assert(plan("join_anti").toLowerCase.contains("leftanti"))
  }

  test("silver pipelines stay free of (slow) Scala/Python UDF nodes") {
    for (q <- Seq("silver_json_pipeline", "silver_flightize",
      "dedup_minhash_sig", "text_stats")) {
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q has a UDF node")
    }
  }

  test("minhash signature stage aggregates map-side before its shuffle") {
    val p = plan("dedup_minhash_sig")
    // string min buffers are var-length, so Spark picks SortAggregate;
    // what matters for scale is the partial (map-side) pass below the
    // exchange, shrinking |docs x shingles| rows to |docs| pre-shuffle
    assert(p.contains("partial_min"), p)
    assert(p.indexOf("Exchange hashpartitioning") < p.indexOf("partial_min"), p)
  }
}
