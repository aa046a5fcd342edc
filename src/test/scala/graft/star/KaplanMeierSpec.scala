package graft.star

import graft.SparkSpec

/** orders_kaplan_meier: the product-limit estimator must replay a local
  * integer fold exactly, and the survival curve must satisfy the KM
  * structural laws (monotone survival, strictly decreasing risk sets,
  * risk accounting that sums to the enrolled population). */
class KaplanMeierSpec extends SparkSpec {

  test("KM curve: integer fold replays locally; risk accounting closes; survival monotone") {
    import spark.implicits._
    val rows = Aggs.kaplanMeier(spark, sf0001)
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)

    // ascending time, strictly decreasing risk set
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 < a._2, s"n_risk must strictly decrease at t=${b._1}")
    case _ => }

    // risk accounting: n_risk(t_i) = N - sum_{j<i} (d_j + c_j), and the
    // last risk set exactly covers its own events + censorings
    val n0 = rows.head._2
    var seen = 0L
    rows.foreach { case (t, n, d, c, _, _) =>
      assert(n == n0 - seen, s"risk set broken at t=$t")
      assert(d + c >= 1, s"empty grid row at t=$t")
      seen += d + c
    }
    assert(seen == n0, "every enrolled order must exit as event or censored")

    // the integer-scaled product-limit fold, replayed locally
    var s = 1000000000L
    rows.foreach { case (t, n, d, _, sScaled, sDouble) =>
      s = s * (n - d) / n
      assert(sScaled == s, s"fold diverged at t=$t")
      assert(sDouble == sScaled.toDouble / 1000000000L)
      assert(sDouble >= 0.0 && sDouble <= 1.0)
    }
    // survival is non-increasing and strictly drops exactly on event days
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 <= a._5)
      // strict drop on event days (guard: floor can absorb a drop only
      // when prev_scaled * d < n, i.e. survival already ~1e-6)
      if (b._3 > 0 && a._5 * b._3 >= b._2)
        assert(b._5 < a._5, s"event at t=${b._1} must drop survival")
      if (b._3 == 0)
        assert(b._5 == a._5, s"censor-only day t=${b._1} must not move survival")
    case _ => }
  }
}
