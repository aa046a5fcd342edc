package graft.llm

import graft.SparkSpec

/** Jensen–Shannon divergence between language unigram distributions:
  * scalar replay of the exact qlog2 fixed-point formulation, bounds,
  * and the all-pairs coverage law. */
class JsDivergenceSpec extends SparkSpec {

  private def qlog2(c: Long): Long = {
    require(c > 0)
    val b = 63 - java.lang.Long.numberOfLeadingZeros(c)
    (b.toLong << 10) + ((c << 10) >> b) - 1024
  }

  test("jsd replays from scalar counts; bounded in [0, ~1] bit; covers all lang pairs") {
    import spark.implicits._
    val got = Inference_jsd()
    val docs = graft.Tables(spark, sf0001, "documents")
      .select("lang", "text").as[(String, String)].collect()
    val counts = docs.flatMap { case (l, t) =>
      t.split(" ", -1).filter(_.nonEmpty).map(w => (l, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val langs = docs.map(_._1).distinct.sorted
    assert(got.size == langs.size * (langs.size - 1) / 2)

    val byLang = counts.groupBy(_._1._1)
      .view.mapValues(_.map { case ((_, w), c) => w -> c }.toMap).toMap
    val totals = byLang.view.mapValues(_.values.sum).toMap
    got.foreach { case (l1, l2, n1, n2, jsd) =>
      assert(n1 == totals(l1) && n2 == totals(l2))
      val (m1, m2) = (byLang(l1), byLang(l2))
      val vocab = m1.keySet ++ m2.keySet
      var s1 = 0L; var s2 = 0L
      vocab.foreach { w =>
        val c1 = m1.getOrElse(w, 0L); val c2 = m2.getOrElse(w, 0L)
        if (c1 > 0)
          s1 += c1 * (qlog2(2 * c1 * n2) - qlog2(c1 * n2 + c2 * n1))
        if (c2 > 0)
          s2 += c2 * (qlog2(2 * c2 * n1) - qlog2(c2 * n1 + c1 * n2))
      }
      val expect = (s1.toDouble / n1 + s2.toDouble / n2) / 2048.0
      assert(jsd == expect)
      // JSD in bits lies in [0, 1]; the qlog2 quantization can stray
      // by at most ~1/1024 per term
      assert(jsd >= -0.01 && jsd <= 1.01)
    }
  }

  private def Inference_jsd() = {
    import spark.implicits._
    TextStats.jsDivergence(spark, sf0001)
      .as[(String, String, Long, Long, Double)].collect().toSeq
  }
}
