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

}
