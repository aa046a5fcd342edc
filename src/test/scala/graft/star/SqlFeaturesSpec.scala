package graft.star

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Local proofs for the SQL-surface features: the recursive census
  * partitions the corpus, LATERAL LIMIT equals the explicit ranked-
  * window top-N, and the interval frame dominates the daily value. */
class SqlFeaturesSpec extends SparkSpec {

  test("recursive closure: depths partition the corpus, bounded by log2") {
    val rows = SqlFeatures.recursiveClosure(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.map(_._2).sum == nDocs)
    val maxId = graft.Tables(spark, sf0001, "documents")
      .agg(max("doc_id")).head().getLong(0)
    val bound = 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxId, 1))
    assert(rows.map(_._1).max <= bound,
      s"depth ${rows.map(_._1).max} exceeds log2 bound $bound")
  }

  test("lateral top-n equals the explicit ranked-window formulation") {
    import spark.implicits._
    val lateral = SqlFeatures.lateralTopn(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ranked = graft.Tables(spark, sf0001, "customer")
      .join(graft.Tables(spark, sf0001, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"n_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey")))
      .filter($"rk" <= 2)
      .orderBy($"n_name", $"c_acctbal".desc, $"c_custkey")
      .select($"n_name", $"c_custkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(lateral.nonEmpty && lateral == ranked)
  }

  test("correlated scalar subquery decorrelates to one aggregate + join") {
    val p = SqlFeatures.correlatedScalar(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("subquery"), // no per-row re-execution
      p.linesIterator.filter(_.toLowerCase.contains("subquery")).mkString("\n"))
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).nonEmpty, p)
  }

  test("interval frame: trailing sum dominates the day and resets on gaps") {
    val rows = SqlFeatures.rangeInterval(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, rev, rev7) =>
      assert(rev7 >= rev - 1e-9, s"$et frame sum $rev7 below day value $rev")
    }
  }
}
