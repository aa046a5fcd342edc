package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `embed_knn_graph_autok`: the two-phase skinny-ranked k-NN graph over
  * the K∝N IVF cells must be bit-identical to the naive single-phase
  * exact form (the 1e-9 double-cosine band admits every pair the exact
  * rank-3 cut could), and structurally a within-cell graph. */
class KnnAutoKSpec extends SparkSpec {

  test("two-phase autok knn equals the single-phase exact within-cell form") {
    import spark.implicits._
    graft.functions.DecimalDot.register(spark)
    val fast = Similarity.knnGraphAutoK(spark, sf0001)
    // naive: exact decimal cosine on EVERY in-cell pair, one ranking
    val asg = Similarity.autoKAssign(spark, sf0001)
    val emb = graft.Tables(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "embedding",
        "decimal_dot(embedding, embedding) AS nrm")
      .join(asg, "vec_id")
    val a = emb.select($"vec_id".as("v1"), $"cell", $"embedding".as("e1"),
      $"nrm".as("n1"))
    val b = emb.select($"vec_id".as("v2"), $"cell".as("cell_b"),
      $"embedding".as("e2"), $"nrm".as("n2"))
    val naive = a.join(b, $"cell" === $"cell_b" && $"v1" =!= $"v2")
      .selectExpr("v1", "cell", "v2",
        "(decimal_dot(e1, e2) / sqrt(n1 * n2)) AS cosine")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"v1").orderBy($"cosine".desc, $"v2")))
      .filter($"rank" <= 3)
      .select($"v1", $"rank", $"v2", $"cell", $"cosine")
    assert(fast.count() == naive.count())
    assert(fast.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fast).count() == 0)
  }

  test("autok knn is a within-cell graph with contiguous ranks") {
    import spark.implicits._
    val g = Similarity.knnGraphAutoK(spark, sf0001).cache()
    val asg = Similarity.autoKAssign(spark, sf0001)
    // neighbour v2 lives in the same cell as the query v1
    val wrongCell = g.join(asg.withColumnRenamed("vec_id", "v2")
        .withColumnRenamed("cell", "cell2"), Seq("v2"))
      .filter($"cell" =!= $"cell2").count()
    assert(wrongCell == 0)
    // ranks are 1..k contiguous per query
    val bad = g.groupBy($"v1")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
      .filter($"mn" =!= 1 || $"mx" =!= $"n" || $"n" > 3).count()
    assert(bad == 0)
    g.unpersist()
  }
}
