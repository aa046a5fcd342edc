package graft.star

import graft.SparkSpec

/** events_ab_cuped + stat_theil_sen: both distributed estimators must
  * equal single-threaded reference solves on collected data, and CUPED
  * must preserve the pooled mean (the adjustment is mean-neutral). */
class CupedTheilSenSpec extends SparkSpec {

  test("CUPED theta and adjusted means equal a local reference; adjustment is mean-neutral") {
    import spark.implicits._
    val got = Warehouse.abCuped(spark, sf0001)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 2)

    val pu = graft.Tables(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "CAST(round(value * 100) AS BIGINT) c")
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        val x = rs.filter(r => r._2 == "view" || r._2 == "click").map(_._3).sum
        val y = rs.filter(_._2 == "purchase").map(_._3).sum
        ((u % 2).toInt, x, y)
      }.toSeq
    val nd = pu.size.toDouble
    val sx = pu.map(r => BigInt(r._2)).sum
    val sy = pu.map(r => BigInt(r._3)).sum
    val sxy = pu.map(r => BigInt(r._2) * BigInt(r._3)).sum
    val sxx = pu.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val theta = (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (nd * sxx.toDouble - sx.toDouble * sx.toDouble)
    val xbar = sx.toDouble / nd
    got.foreach { case (v, n, meanY, thetaGot, cuped) =>
      val vs = pu.filter(_._1 == v)
      assert(n == vs.size)
      assert(thetaGot == theta, "theta")
      val mx = vs.map(r => BigInt(r._2)).sum.toDouble / n
      val my = vs.map(r => BigInt(r._3)).sum.toDouble / n
      assert(meanY == my, s"variant $v mean_y")
      assert(cuped == my - theta * (mx - xbar), s"variant $v cuped")
    }
    // mean-neutrality: sum_v n_v*(cuped_v - mean_y_v) = -theta * sum_v n_v*(mean_x_v - xbar) = 0
    val drift = got.map { case (_, n, meanY, _, cuped) => n * (cuped - meanY) }.sum
    val scale = got.map { case (_, n, meanY, _, _) => math.abs(n * meanY) }.sum
    assert(math.abs(drift) <= 1e-12 * scale, s"adjustment shifted the pooled mean by $drift")
  }

  test("Theil-Sen median slope equals a local reference over the monthly series") {
    import spark.implicits._
    val Seq((nMonths, nPairs, slope, intercept)) = Aggs.statTheilSen(spark, sf0001)
      .as[(Long, Long, Double, Double)].collect().toSeq

    val monthly = graft.Tables(spark, sf0001, "orders")
      .selectExpr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS LONG) m",
        "CAST(round(o_totalprice * 100) AS BIGINT) c")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).sum.toDouble }
      .toSeq.sortBy(_._1)
    assert(nMonths == monthly.size)
    val slopes = for {
      (i, yi) <- monthly; (j, yj) <- monthly if i < j
    } yield (i, j, (yj - yi) / (j - i).toDouble)
    assert(nPairs == slopes.size)
    val sorted = slopes.sortBy(s => (s._3, s._1, s._2))
    assert(slope == sorted(((slopes.size + 1) / 2 - 1).toInt)._3)
    val b0s = monthly.map { case (m, y) => (y - slope * m, m) }.sortBy(identity)
    assert(intercept == b0s(((monthly.size + 1) / 2 - 1).toInt)._1)
  }
}
