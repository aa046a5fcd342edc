package graft.star

import graft.SparkSpec

/** stat_bradley_terry: the distributed two-round MM solve must equal a
  * single-threaded reference implementation run on the collected
  * contest data — the decomposition is proved, not assumed. */
class BradleyTerrySpec extends SparkSpec {

  test("distributed BT strengths equal a local reference solve") {
    import spark.implicits._
    val got = Aggs.statBradleyTerry(spark, sf0001)
      .as[(String, Long, Long, Double, Double, Int)].collect().toSeq
    assert(got.size >= 2)

    // local reference: per-user decimal value sums -> contests -> MM x2
    val sums = graft.Tables(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "CAST(value AS DECIMAL(28,5)) v")
      .as[(Long, String, java.math.BigDecimal)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(r => BigDecimal(r._3)).sum }
    val byUser = sums.groupBy(_._1._1)
    val types = sums.keySet.map(_._2).toSeq.sorted
    val games = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val wins = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      (_, m) <- byUser
      perType = m.map { case ((_, t), v) => t -> v }
      ta <- perType.keys; tb <- perType.keys
      if ta < tb && perType(ta) != perType(tb)
    } {
      games((ta, tb)) += 1; games((tb, ta)) += 1
      wins(if (perType(ta) > perType(tb)) ta else tb) += 1
    }
    val g = types.map(t => t -> types.map(o => games((t, o))).sum).toMap
    val w1 = types.map(t => t -> 2.0 * wins(t) / g(t)).toMap
    val strength = types.map { t =>
      val q = types.filter(o => games((t, o)) > 0)
        .map(o => math.floor(games((t, o)).toDouble / (w1(t) + w1(o)) * 1e9 + 0.5).toLong)
        .sum
      t -> wins(t).toDouble * 1e9 / q
    }.toMap

    got.foreach { case (t, gGot, wGot, w1Got, sGot, _) =>
      assert(gGot == g(t), s"$t games")
      assert(wGot == wins(t), s"$t wins")
      assert(w1Got == w1(t), s"$t w1")
      assert(sGot == strength(t), s"$t strength")
    }
    // ranks are a permutation ordered by strength desc
    val byRank = got.sortBy(_._6).map(_._5)
    assert(byRank.sameElements(byRank.sorted(Ordering[Double].reverse)))
  }
}
