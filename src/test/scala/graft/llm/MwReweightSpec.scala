package graft.llm

import graft.SparkSpec

/** corpus_mw_reweight: mixture-weight invariants of the
  * multiplicative-weights domain reweighting. */
class MwReweightSpec extends SparkSpec {

  test("weights form a mixture and upweight exactly the high-excess domains") {
    import spark.implicits._
    val rows = Curate.mwReweight(spark, sf0001)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(rows.size > 1)
    val wsum = rows.map(_._5).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    assert(rows.forall(_._4 >= 0.0), "excess is clamped at 0")
    assert(rows.forall(_._5 > 0.0), "every domain keeps mass")
    // the multiplicative update: weight/tok_share == (1 + eta*excess)/Z,
    // so the boost ratio must be strictly increasing in excess
    val boosts = rows.map(r => (r._4, r._5 / r._3)).sortBy(_._1)
    boosts.sliding(2).foreach { case Seq((e1, b1), (e2, b2)) =>
      if (e2 > e1) assert(b2 > b1, s"boost not monotone at excess $e2")
      else assert(math.abs(b2 - b1) < 1e-9) // 1e12 quantize jitter
    case _ => ()
    }
    // zero-excess domains are pure downweights (Z > 1 when any excess > 0)
    if (rows.exists(_._4 > 0)) {
      val zeroes = rows.filter(_._4 == 0.0)
      zeroes.foreach(r => assert(r._5 < r._3, s"${r._1} should shed mass"))
    }
  }
}
