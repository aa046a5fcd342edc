package graft.star

import graft.SparkSpec

/** Fellegi–Sunter linkage: gamma-table accounting, weight monotonicity,
  * and entity-grouping laws (components are transitive closures of the
  * link set). */
class LinkageSpec extends SparkSpec {

  test("gamma table closes over the candidate set; weights follow the m/u ratios") {
    import spark.implicits._
    val table = Linkage.fellegiSunter(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(table.nonEmpty && table.size <= 8)
    val nPairs = table.map(_._4).sum
    assert(nPairs > 0)

    // replay the u-estimates and each pattern's weight exactly
    val gamma = Linkage.gammaPairs(spark, sf0001)
      .select("g_name", "g_type", "g_size")
      .as[(Long, Long, Long)].collect().toSeq
    assert(gamma.size == nPairs)
    val n = gamma.size.toLong
    def clamp(x: Long) = math.min(math.max(x, 1L), n - 1)
    val ua = (clamp(gamma.map(_._1).sum), clamp(gamma.map(_._2).sum),
      clamp(gamma.map(_._3).sum))
    table.foreach { case (gn, gt, gs, cnt, w) =>
      assert(cnt == gamma.count(g => g == ((gn, gt, gs))))
      val m = (if (gn == 1) 0.95 else 0.05) * (if (gt == 1) 0.9 else 0.1) *
        (if (gs == 1) 0.8 else 0.2)
      val u = ((if (gn == 1) ua._1 else n - ua._1).toDouble / n) *
        ((if (gt == 1) ua._2 else n - ua._2).toDouble / n) *
        ((if (gs == 1) ua._3 else n - ua._3).toDouble / n)
      assert(math.abs(w - m / u) < math.abs(w) * 1e-12)
    }
    // more field agreements never lower the weight when agreement is
    // rarer than 50% (true for g_name here): full-agree beats full-disagree
    val byPat = table.map(t => ((t._1, t._2, t._3), t._5)).toMap
    for (hi <- byPat.get((1L, 1L, 1L)); lo <- byPat.get((0L, 0L, 0L)))
      assert(hi > lo)
  }

  test("matched pairs are exactly the link-region patterns; entities are transitive closures") {
    import spark.implicits._
    val pairs = Linkage.matchedPairs(spark, sf0001)
      .select("k1", "k2", "weight").as[(Long, Long, Double)].collect().toSeq
    pairs.foreach { case (k1, k2, w) =>
      assert(k1 < k2 && w >= 1000.0)
    }
    val ents = Linkage.entities(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val sampled = graft.Tables(spark, sf0001, "part")
      .filter("p_partkey % 4 = 0").count()
    assert(ents.size == sampled) // every blocked record gets an entity
    val eidOf = ents.map(e => e._1 -> e._2).toMap
    // linked pairs land in the same entity; entity id is the component min
    pairs.foreach { case (k1, k2, _) => assert(eidOf(k1) == eidOf(k2)) }
    ents.groupBy(_._2).foreach { case (eid, members) =>
      assert(members.map(_._1).min == eid)
      assert(members.forall(_._3 == members.size))
      assert(members.count(_._4) == 1) // exactly one canonical per entity
    }
  }

  test("blocking recall: accounting closes; blocked sets are subsets") {
    import spark.implicits._
    val (ns, nAll, nTruth, nBlocked, nTruthBlocked, pc, rr) =
      Linkage.blockingRecall(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    assert(nAll == ns * (ns - 1) / 2) // all unordered pairs of the sample
    assert(nTruthBlocked <= nTruth && nTruthBlocked <= nBlocked)
    assert(nBlocked <= nAll && nTruth <= nAll)
    assert(pc == nTruthBlocked.toDouble / nTruth)
    assert(rr == 1.0 - nBlocked.toDouble / nAll)
    // 25 brands -> ~96% reduction at scale; the sf0.001 sample is only
    // ~10 records so blocks are coarse — assert the direction, not the
    // asymptote
    assert(rr > 0.5)
  }

  test("survivorship: one golden record per entity with modal type and exact avg cents") {
    import spark.implicits._
    val golden = Linkage.survivorship(spark, sf0001)
      .as[(Long, Long, String, Int, Int, Long)].collect().toSeq
    val ents = Linkage.entities(spark, sf0001)
      .select("p_partkey", "entity_id").as[(Long, Long)].collect().toSeq
    assert(golden.size == ents.map(_._2).distinct.size)
    val parts = graft.Tables(spark, sf0001, "part")
      .filter("p_partkey % 4 = 0")
      .selectExpr("p_partkey", "p_type", "p_size",
        "CAST(round(p_retailprice * 100) AS BIGINT)")
      .as[(Long, String, Int, Long)].collect()
      .map(p => p._1 -> p).toMap
    val byEntity = ents.groupBy(_._2)
    golden.foreach { case (eid, n, modalType, minS, maxS, avgC) =>
      val ms = byEntity(eid).map(e => parts(e._1))
      assert(n == ms.size)
      val modal = ms.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.head._1
      assert(modalType == modal)
      assert(minS == ms.map(_._3).min && maxS == ms.map(_._3).max)
      assert(avgC == ms.map(_._4).sum / ms.size)
    }
  }
}
