package graft.star

import graft.SparkSpec

/** dq_k_anonymity: full local replay of the equivalence-class audit
  * plus the structural laws (min class bounds, at-risk accounting). */
class KAnonymitySpec extends SparkSpec {

  test("k-anonymity audit replays locally; accounting closes") {
    import spark.implicits._
    val got = Warehouse.kAnonymity(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)

    val docs = graft.Tables(spark, sf0001, "documents")
      .selectExpr("lang", "source", "n_chars div 100 AS b")
      .as[(String, String, Long)].collect()
    val classes = docs.groupBy(identity).view.mapValues(_ => ())
    val byStratum = docs.groupBy(d => (d._1, d._2))
    assert(got.size == byStratum.size)
    got.foreach { case (lang, source, nDocs, nClasses, k, below, frac) =>
      val rows = byStratum((lang, source))
      val sizes = rows.groupBy(_._3).map(_._2.size.toLong).toSeq
      assert(nDocs == rows.size)
      assert(nClasses == sizes.size)
      assert(k == sizes.min)
      assert(below == sizes.filter(_ < 5).sum)
      assert(frac == below.toDouble / nDocs)
      assert(k >= 1 && below <= nDocs)
    }
    assert(classes.nonEmpty)
  }
}
