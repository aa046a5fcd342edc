package graft.llm

import graft.SparkSpec

/** graph_kcore_peel3: the distributed peel must agree with a local
  * reference peel of the collected candidate graph, and the output
  * must satisfy the core property (every survivor keeps >= k
  * neighbors among survivors). */
class KcoreSpec extends SparkSpec {

  test("distributed 2-core peel equals a local reference peel") {
    import spark.implicits._
    val got = Cluster.kcorePeel(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)

    // local reference: collect pairs, peel 3 rounds at k=2
    val pairs = Dedup.candidatePairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    var edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= 2).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val want = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(got == want)

    // core property: the emitted degree is the within-core degree >= k
    assert(got.values.forall(_ >= 2))
  }
}
