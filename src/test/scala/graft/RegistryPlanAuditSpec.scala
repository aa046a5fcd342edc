package graft

/** Registry-wide plan audit: EVERY registered query must (a) build and
  * plan without error at sf0.001, (b) contain no CartesianProduct —
  * the plan shape that turns into |A|×|B| work at any scale, and
  * (c) contain no interpreted row-at-a-time UDF node (ScalaUDF /
  * BatchEvalPython) — the codegen killers. Per-query gates live in
  * PlanSpec; this is the blanket no-regression sweep, so a NEW query
  * with a pathological plan fails CI the day it lands, not at the
  * next bench.
  *
  * BroadcastNestedLoopJoin is NOT blanket-banned: the registry's only
  * BNLJ sites are 1-row broadcast aggregates (corpus stats, global
  * totals) and the deliberately-honest `join_range` baseline whose
  * banded rewrite is the scale path — those are asserted individually
  * in PlanSpec. */
class RegistryPlanAuditSpec extends SparkSpec {

  test("all registered queries plan clean: no cartesian, no interpreted UDFs") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct"
        if (plan.contains("ScalaUDF") || plan.contains("BatchEvalPython"))
          failures += s"$name: interpreted UDF node"
      } catch {
        case e: Throwable =>
          failures += s"$name: failed to plan — ${e.getMessage.take(200)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
