package graft.llm

import graft.SparkSpec

/** text_yule_k + corpus_token_budget + graph_assortativity: local
  * replays and structural laws beyond the oracle's engine parity. */
class YuleBudgetAssortSpec extends SparkSpec {

  test("Yule's K replays locally per language; bounds hold") {
    import spark.implicits._
    val got = TextStats.yuleK(spark, sf0001)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    val docs = graft.Tables(spark, sf0001, "documents")
      .selectExpr("lang", "text").as[(String, String)].collect()
    val local = docs.groupBy(_._1).map { case (lang, ds) =>
      val ks = ds.map { case (_, text) =>
        val counts = text.split(" ", -1).filter(_.nonEmpty)
          .groupBy(identity).map(_._2.length.toLong)
        val n = counts.sum
        val s2 = counts.map(c => c * c).sum
        math.floor(
          (10000L * (s2 - n)).toDouble / (n.toDouble * n.toDouble) * 1e6
            + 0.5).toLong
      }
      lang -> ks
    }
    got.foreach { case (lang, n, mean, kMin, kMax) =>
      val ks = local(lang)
      assert(n == ks.size)
      assert(mean == ks.sum.toDouble / n / 1e6, s"$lang mean")
      assert(kMin == ks.min.toDouble / 1e6 && kMax == ks.max.toDouble / 1e6)
      assert(kMin >= 0.0 && kMin <= mean && mean <= kMax)
    }
  }

  test("token budget: selected set is the quality prefix that fits N/4 tokens") {
    import spark.implicits._
    val got = Curate.tokenBudget(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    val docs = graft.Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "source",
        "CAST(size(split(text, ' ')) AS BIGINT)",
        """(10000 * size(array_distinct(split(text, ' '))))
           div size(split(text, ' '))""")
      .as[(Long, String, Long, Long)].collect()
    val total = docs.map(_._3).sum
    // greedy local replay: best-score prefix whose cumsum*4 <= total
    var cum = 0L
    val sel = docs.sortBy(d => (-d._4, d._1)).takeWhile { d =>
      cum += d._3; cum * 4 <= total
    }.map(_._1).toSet
    val bySource = docs.groupBy(_._2)
    assert(got.size == bySource.size)
    got.foreach { case (src, n, nSel, tokTot, tokSel, share) =>
      val ds = bySource(src)
      assert(n == ds.size)
      assert(nSel == ds.count(d => sel(d._1)), s"$src n_selected")
      assert(tokTot == ds.map(_._3).sum)
      assert(tokSel == ds.filter(d => sel(d._1)).map(_._3).sum)
      assert(share == tokSel.toDouble / tokTot)
    }
    val admitted = got.map(_._5).sum
    assert(admitted * 4 <= total, "budget must be respected")
    assert(admitted > 0, "cut must admit something")
  }

  test("assortativity is a Pearson correlation: |r| <= 1, local replay agrees") {
    import spark.implicits._
    val Seq((m, sjk, sj, sj2, r)) = Cluster.assortativity(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val edges = Dedup.candidatePairs(spark, sf0001)
      .selectExpr("d1", "d2").as[(Long, Long)].collect()
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val dirEdges = edges.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    assert(m == dirEdges.size)
    assert(sjk == dirEdges.map { case (a, b) => deg(a) * deg(b) }.sum)
    assert(sj == dirEdges.map { case (a, _) => deg(a) }.sum)
    assert(sj2 == dirEdges.map { case (a, _) => deg(a) * deg(a) }.sum)
    assert(r == (m.toDouble * sjk.toDouble - sj.toDouble * sj.toDouble) /
      (m.toDouble * sj2.toDouble - sj.toDouble * sj.toDouble))
    assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12, s"r=$r")
  }
}
