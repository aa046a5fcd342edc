package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: result-identical to the nested-loop
  * form it rewrites, physically a hash join, and idempotent. */
class BandedRangeJoinSpec extends SparkSpec {

  // the naive shape a user would write: non-equi band predicate only
  private def naive = {
    import spark.implicits._
    val sizes = graft.Tables(spark, sf0001, "part").select($"p_size").distinct()
    graft.Tables(spark, sf0001, "lineitem")
      .select($"l_quantity")
      .join(sizes,
        $"l_quantity" >= $"p_size" - 1 && $"l_quantity" <= $"p_size" + 1)
  }

  private def rewritten = {
    val plan = BandedRangeJoinRule(naive.queryExecution.analyzed)
    org.apache.spark.sql.GraftShim.ofRows(spark, plan)
  }

  test("rewrite is result-identical to the nested-loop join") {
    val exp = naive.groupBy("p_size").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = rewritten.groupBy("p_size").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exp.nonEmpty && got == exp)
  }

  test("rewrite replaces the nested loop with a hash join") {
    val naiveP = naive.queryExecution.executedPlan.toString
    assert(naiveP.contains("BroadcastNestedLoopJoin"), naiveP)
    val p = rewritten.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("rule is idempotent") {
    val once = BandedRangeJoinRule(naive.queryExecution.analyzed)
    val twice = BandedRangeJoinRule(once)
    assert(once.toString == twice.toString)
  }

  test("non-band conditions are left untouched") {
    import spark.implicits._
    val sizes = graft.Tables(spark, sf0001, "part").select($"p_size").distinct()
    val oneSided = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_quantity")
      .join(sizes, $"l_quantity" >= $"p_size" - 1)
    val plan = oneSided.queryExecution.analyzed
    assert(BandedRangeJoinRule(plan).toString == plan.toString)
  }

  test("literal on the LEFT of the + still rewrites (Add(lit, expr) arm)") {
    import spark.implicits._
    val sizes = graft.Tables(spark, sf0001, "part").select($"p_size").distinct()
    val j = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_quantity")
      .join(sizes,
        $"l_quantity" >= $"p_size" - 1 && $"l_quantity" <= lit(1) + $"p_size")
    val before = j.queryExecution.analyzed
    val after = BandedRangeJoinRule(before)
    assert(after.toString != before.toString, "Add(lit, expr) did not rewrite")
    val exp = j.groupBy("p_size").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = org.apache.spark.sql.GraftShim.ofRows(spark, after)
      .groupBy("p_size").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exp.nonEmpty && got == exp)
  }

  test("bigint band columns are NOT rewritten (double rounding unsafe)") {
    import spark.implicits._
    // nanosecond-epoch magnitudes: > 2^53, not exactly double-representable
    val probe = Seq(18014398509481986L - 1).toDF("a") // 2^54 + 2 - 1
    val build = Seq(18014398509481986L).toDF("b")
    val j = probe.join(build, $"a" >= $"b" - 1 && $"a" <= $"b" + 1)
    val plan = j.queryExecution.analyzed
    assert(BandedRangeJoinRule(plan).toString == plan.toString)
    assert(j.count() == 1) // the pair the rounded rewrite would drop
  }

  test("random band widths: rewrite matches the nested loop on int and double data") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val as = Seq.fill(300)(rng.nextInt(2000) - 1000).toDF("a")
    val bs = Seq.fill(40)(rng.nextInt(2000) - 1000).toDF("b")
    val asD = Seq.fill(300)((rng.nextDouble() - 0.5) * 100).toDF("a")
    val bsD = Seq.fill(40)((rng.nextDouble() - 0.5) * 100).toDF("b")
    val widths = Seq((1.0, 1.0), (3.0, 7.0), (0.5, 0.25), (12.0, 0.0))
    for (((l, r), (c1, c2)) <- Seq((as, bs), (asD, bsD)).flatMap(p =>
        widths.map(w => (p, w))) if c1 + c2 > 0) {
      val naiveJ = l.join(r, $"a" >= $"b" - c1 && $"a" <= $"b" + c2)
      val rewrittenJ = org.apache.spark.sql.GraftShim.ofRows(spark,
        BandedRangeJoinRule(naiveJ.queryExecution.analyzed))
      val exp = naiveJ.count()
      assert(exp > 0, s"degenerate case c1=$c1 c2=$c2")
      assert(rewrittenJ.count() == exp, s"mismatch at c1=$c1 c2=$c2")
    }
  }

  test("bucket misalignment at the rounding edge is absorbed by padding") {
    import spark.implicits._
    // int values adjacent to bucket boundaries of W=2: every boundary
    // value must still find its band partners after the rewrite
    val vals = Seq(-3, -2, -1, 0, 1, 2, 3, 1999999998, 1999999999, 2000000000)
    val probe = vals.toDF("a")
    val build = vals.toDF("b")
    val j = probe.join(build, $"a" >= $"b" - 1 && $"a" <= $"b" + 1)
    val exp = j.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val rw = BandedRangeJoinRule(j.queryExecution.analyzed)
    assert(rw.toString != j.queryExecution.analyzed.toString, "rule must fire for int")
    val got = org.apache.spark.sql.GraftShim.ofRows(spark, rw)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(exp.nonEmpty && got == exp)
  }
}
