package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Silver pipeline invariants (SURVEY.md §5.3): parse-drop monotonicity,
  * non-null keys after drop, typed schema, and the two corruption
  * classes behaving as designed. */
class SilverJsonSpec extends SparkSpec {

  test("rows out <= rows in; survivors have non-null year") {
    val in = graft.Tables(spark, sf0001, "lineitem").count()
    val out = SilverJson.silver(spark, sf0001)
    val n = out.count()
    assert(n <= in)
    assert(out.filter(col("year").isNull).count() == 0)
  }

  test("exactly the unrepairable rows are dropped") {
    val li = graft.Tables(spark, sf0001, "lineitem")
    val truncated = li.filter(
      col("l_orderkey") % 23 === 0 && col("l_linenumber") === 2).count()
    val in = li.count()
    assert(SilverJson.silver(spark, sf0001).count() == in - truncated)
  }

  test("repaired rows (trailing noise) are kept and parse correctly") {
    val li = graft.Tables(spark, sf0001, "lineitem")
    val repaired = li.filter(
      col("l_orderkey") % 19 === 0 && col("l_linenumber") === 1).count()
    assert(repaired > 0, "fixture must exercise the repair path")
    // produced_at encodes (orderkey*10 + linenumber): check the repaired
    // keys all survived
    val survivors = SilverJson.silver(spark, sf0001)
      .filter((col("produced_at") % 10 === 1) &&
        ((col("produced_at") - 1) / 10 % 19 === 0))
      .count()
    assert(survivors == repaired)
  }

  test("typed schema after two-phase casting") {
    val sch = SilverJson.silver(spark, sf0001).schema
    assert(sch("year").dataType.typeName == "integer")
    assert(sch("arr_flights").dataType.typeName == "double")
    assert(sch("produced_at").dataType.typeName == "long")
    assert(sch("carrier").dataType.typeName == "string")
  }

  test("plan stays native: no python/scala UDF nodes, codegen intact") {
    val plan = SilverJson.silver(spark, sf0001).queryExecution
      .executedPlan.toString
    assert(!plan.contains("BatchEvalPython"))
    assert(!plan.contains("ScalaUDF"))
  }
}
