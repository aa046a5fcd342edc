package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytical invariants of the Gram-aggregated covariance and label
  * propagation that the value-level oracle doesn't state. */
class GramLabelSpec extends SparkSpec {

  test("covariance: diagonal matches dim_stats variance, Cauchy-Schwarz holds") {
    import spark.implicits._
    val cov = Similarity.covariance(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val sd = Similarity.dimStats(spark, sf0001)
      .select($"dim", $"stddev").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(cov.size == 64 * 65 / 2)
    (0 until 64).foreach { i =>
      assert(math.abs(math.sqrt(cov((i, i))) - sd(i)) < 1e-9,
        s"diag($i): sqrt(cov)=${math.sqrt(cov((i, i)))} vs stddev=${sd(i)}")
    }
    cov.foreach { case ((i, j), c) =>
      assert(math.abs(c) <= sd(i) * sd(j) + 1e-9,
        s"|cov($i,$j)|=$c exceeds sd_i*sd_j=${sd(i) * sd(j)}")
    }
  }

  test("covariance: single-pass aggregator agrees with naive explode join") {
    import spark.implicits._
    // independent Spark-side naive formulation (the d^2 blow-up form the
    // aggregator exists to avoid) — same quantization, tiny slice (8 dims)
    val e = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", posexplode($"embedding").as(Seq("d", "xf")))
      .filter($"d" < 8)
      .select($"vec_id", $"d", $"xf".cast("double").as("x"))
    val p = e.as("a").join(e.as("b"),
        $"a.vec_id" === $"b.vec_id" && $"a.d" <= $"b.d")
      .groupBy($"a.d".as("i"), $"b.d".as("j"))
      .agg(sum(floor($"a.x" * $"b.x" * 1e9 + 0.5).cast("bigint")).as("sxy"),
        count(lit(1)).as("n"))
    val m = e.groupBy($"d")
      .agg(sum(floor($"x" * 1e9 + 0.5).cast("bigint")).as("sx"))
    val naive = p
      .join(m.select($"d".as("i"), $"sx".as("sxi")), "i")
      .join(m.select($"d".as("j"), $"sx".as("sxj")), "j")
      .select($"i", $"j",
        ((($"sxy".cast("double") / 1e9) -
          (($"sxi".cast("double") / 1e9) * ($"sxj".cast("double") / 1e9))
            / $"n".cast("double")) / ($"n" - 1).cast("double")).as("cov"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val agg = Similarity.covariance(spark, sf0001).collect()
      .filter(r => r.getInt(0) < 8 && r.getInt(1) < 8)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(naive.keySet == agg.keySet)
    naive.foreach { case (k, v) =>
      assert(v == agg(k), s"cell $k: naive=$v agg=${agg(k)} (must be bit-identical)")
    }
  }

  test("label prop: communities refine connected components") {
    import spark.implicits._
    val lp = Cluster.labelProp(spark, sf0001)
    val cc = Cluster.clusters(spark, sf0001)
      .select($"doc_id", $"cluster_id")
    // a node's community label must live in the node's own component —
    // labels only ever travel along edges
    val viol = lp.join(cc, "doc_id")
      .join(cc.select($"doc_id".as("community"), $"cluster_id".as("lbl_comp")),
        "community")
      .filter($"cluster_id" =!= $"lbl_comp")
    assert(viol.count() == 0, "a label crossed a component boundary")
    assert(lp.count() > 0)
  }
}
