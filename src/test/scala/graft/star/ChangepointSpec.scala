package graft.star

import graft.SparkSpec

/** orders_changepoint: the argmax split must equal a local exact
  * binary-segmentation pass over the collected monthly series. */
class ChangepointSpec extends SparkSpec {

  test("split month and gain equal a local exact reference") {
    import spark.implicits._
    val Seq((splitM, nMonths, gain, meanL, meanR)) =
      Calendar.changepoint(spark, sf0001)
        .as[(Long, Long, Double, Double, Double)].collect().toSeq

    val monthly = graft.Tables(spark, sf0001, "orders")
      .selectExpr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS LONG) m",
        "CAST(round(o_totalprice * 100) AS BIGINT) c")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (m, rs) => m -> rs.map(r => BigInt(r._2)).sum }
      .toSeq.sortBy(_._1)
    assert(nMonths == monthly.size)
    val s = monthly.map(_._2).sum
    val n = monthly.size
    var sl = BigInt(0)
    val cands = monthly.zipWithIndex.dropRight(1).map { case ((m, y), i) =>
      sl += y
      val t = i + 1
      val sr = s - sl
      val g = (sl * sl).toDouble / t + (sr * sr).toDouble / (n - t) -
        (s * s).toDouble / n
      (m, t, g, sl.toDouble / t / 100.0, sr.toDouble / (n - t) / 100.0)
    }
    val best = cands.sortBy(c => (-c._3, c._1)).head
    assert(splitM == best._1)
    assert(gain == best._3)
    assert(meanL == best._4 && meanR == best._5)
    // the split is a genuine improvement: between-segment SSE > 0
    assert(gain > 0.0)
  }
}
