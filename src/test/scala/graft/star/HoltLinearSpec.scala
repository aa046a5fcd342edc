package graft.star

import graft.SparkSpec

/** Holt linear smoothing recursion — scalar replay of the exact
  * fixed-point integer recursion. */
class HoltLinearSpec extends SparkSpec {

  test("holt linear: the fixed-point recursion replays exactly; first-month conventions hold") {
    import spark.implicits._
    val got = Calendar.holtLinear(spark, sf0001)
      .as[(java.sql.Date, Double, Double, Long, Long, Long)].collect().toSeq
    assert(got.size >= 12) // years of monthly data
    // replay the recursion from the emitted observations
    def fdiv2(a: Long): Long = { val r = ((a % 2) + 2) % 2; (a - r) / 2 }
    val xs = got.map(r => math.round(r._2 * 100).toLong * 1024L)
    var l = xs.head; var b = 0L
    assert(got.head._3 == got.head._2) // first forecast = first obs
    assert(got.head._4 == xs.head && got.head._5 == 0L && got.head._6 == 0L)
    got.drop(1).zip(xs.drop(1)).foreach { case ((_, _, f, lq, bq, err), xq) =>
      val fq = l + b
      assert(f == fq.toDouble / 1024.0 / 100.0)
      assert(err == xq - fq)
      val l2 = fdiv2(xq + l + b); val b2 = fdiv2(l2 - l + b)
      assert(lq == l2 && bq == b2)
      l = l2; b = b2
    }
    // months strictly increasing
    assert(got.map(_._1.getTime).sliding(2).forall(s => s.head < s.last))
  }

  test("seasonal decomposition: trend+seasonal+residual reassembles the observation") {
    import spark.implicits._
    val got = Calendar.seasonalDecompose(spark, sf0001)
      .as[(java.sql.Date, Double, Option[Double], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got.size >= 13)
    // edges (first/last 6 months) carry no trend; interior rows do
    assert(got.take(6).forall(_._3.isEmpty))
    assert(got.takeRight(6).forall(_._3.isEmpty))
    val interior = got.drop(6).dropRight(6)
    assert(interior.nonEmpty && interior.forall(_._3.nonEmpty))
    // exact reassembly in 1/24-cent units:
    // 24x = trend24 + seasonal24 + residual24
    interior.foreach {
      case (_, rev, Some(trend), Some(s24), Some(r24)) =>
        val x = math.round(rev * 100)
        val trend24 = math.round(trend * 100 * 24)
        assert(24L * x == trend24 + s24 + r24)
      case other => fail(s"interior row missing components: $other")
    }
    // one index per calendar month, constant across years; re-centered:
    // the 12-index mean sits inside the floor-division quantum [0, 1)
    val byMoy = interior
      .groupBy(_._1.toLocalDate.getMonthValue).toSeq
    byMoy.foreach { case (_, rows) =>
      assert(rows.map(_._4.get).distinct.size == 1)
    }
    val seas = byMoy.map(_._2.head._4.get)
    // truncating division leaves |residue| < 12 of either sign
    assert(seas.size < 12 || math.abs(seas.sum) < 12)
  }
}
