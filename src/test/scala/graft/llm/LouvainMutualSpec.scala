package graft.llm

import graft.SparkSpec

/** Synchronous Louvain sweep laws and mutual-kNN reciprocity —
  * scalar replays against the candidate graph / kNN edge list. */
class LouvainMutualSpec extends SparkSpec {

  test("louvain step: move iff 2m > k_u*k_min; target is the min-degree neighbor") {
    import spark.implicits._
    val got = Cluster.louvainStep(spark, sf0001)
      .as[(Long, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(got.nonEmpty)
    val edges = Dedup.candidatePairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
      .flatMap(p => Seq(p, p.swap)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m2 = edges.length.toLong
    assert(got.size == deg.size)
    got.foreach { case (node, k, bestNbr, gainNum, moved, comm) =>
      assert(k == deg(node))
      val nbrs = edges.filter(_._1 == node).map(_._2)
      val best = nbrs.map(v => (deg(v), v)).min
      assert(bestNbr == best._2)
      assert(gainNum == m2 - k * best._1)
      assert(moved == (m2 > k * best._1))
      assert(comm == (if (moved) bestNbr else node))
    }
  }

  test("mutual knn: pairs are exactly the reciprocal top-3 edges") {
    import spark.implicits._
    val knn = Similarity.knnGraph(spark, sf0001)
      .select("v1", "v2", "rank").as[(Long, Long, Int)].collect().toSeq
    val fwd = knn.map(e => (e._1, e._2)).toSet
    val expected = knn
      .filter(e => e._1 < e._2 && fwd.contains((e._2, e._1)))
      .map(e => (e._1, e._2)).toSet
    val got = Similarity.mutualKnn(spark, sf0001)
      .select("v1", "v2").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.toSet == expected)
    got.foreach { case (a, b) =>
      assert(fwd.contains((a, b)) && fwd.contains((b, a)))
    }
  }

  test("mutual knn autok: same reciprocity law over the auto-K cell graph") {
    import spark.implicits._
    val knn = Similarity.knnGraphAutoK(spark, sf0001)
      .select("v1", "v2").as[(Long, Long)].collect().toSeq
    val fwd = knn.toSet
    val expected = knn
      .filter(e => e._1 < e._2 && fwd.contains((e._2, e._1))).toSet
    val got = Similarity.mutualKnnAutoK(spark, sf0001)
      .select("v1", "v2").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.toSet == expected)
  }
}
