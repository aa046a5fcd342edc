package graft.star

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-formulation checks for the sufficient-statistics OLS and the
  * PQ distortion audit. */
class OlsPqSpec extends SparkSpec {

  test("ols: agrees with Spark's builtin corr/covar to float tolerance") {
    import spark.implicits._
    val ours = Aggs.statOlsBrand(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val builtin = graft.Tables(spark, sf0001, "lineitem")
      .join(broadcast(graft.Tables(spark, sf0001, "part")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", round($"l_quantity").cast("double").as("x"),
        round($"l_extendedprice" * 100).cast("double").as("y"))
      .groupBy($"p_brand")
      .agg((covar_samp($"x", $"y") / var_samp($"x")).as("slope"),
        (corr($"x", $"y") * corr($"x", $"y")).as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == builtin.keySet && ours.nonEmpty)
    ours.foreach { case (b, (slope, r2)) =>
      val (s2, q2) = builtin(b)
      assert(math.abs(slope - s2) / math.max(1.0, math.abs(s2)) < 1e-9,
        s"$b slope $slope vs builtin $s2")
      assert(math.abs(r2 - q2) < 1e-9, s"$b r2 $r2 vs builtin $q2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"$b r2 out of range: $r2")
    }
  }

  test("pq distortion: ratio in [0,1), residual energy below corpus energy") {
    val rows = graft.llm.Similarity.pqDistortion(spark, sf0001).collect()
    assert(rows.length == 4) // one row per subspace
    rows.foreach { r =>
      val (sumD2, sumE, ratio) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(sumD2 >= 0 && sumE > 0)
      // mean centroids cannot increase within-cluster SS vs the origin
      assert(ratio >= 0.0 && ratio < 1.0, s"ratio $ratio outside [0,1)")
      assert(r.getDouble(4) >= 0.0) // max_d2
    }
  }
}
