package graft.star

import graft.SparkSpec

/** stat_bh_fdr: the Benjamini–Hochberg step-up must be exactly the
  * textbook rule recomputed locally from the returned p-values, and the
  * add-one randomization p-values must respect their structural bounds.
  * (The DuckDB oracle proves engine parity; this spec proves the
  * statistics are the statistics.) */
class BhFdrSpec extends SparkSpec {

  test("BH step-up selection matches a local recomputation; p-values respect add-one bounds") {
    import spark.implicits._
    val rows = Aggs.statBhFdr(spark, sf0001)
      .as[(String, Double, Double, Int, Int)].collect().toSeq
    assert(rows.nonEmpty)
    val m = rows.size

    // rk is a permutation of 1..m ordered by (p_value, lang)
    val byRank = rows.sortBy(_._4)
    assert(byRank.map(_._4) == (1 to m))
    val resorted = rows.sortBy(r => (r._3, r._1))
    assert(resorted.map(_._1) == byRank.map(_._1), "rank order must be (p_value, lang) order")

    // add-one permutation p: 1/(B+1) <= p <= 1, and obs_stat >= 0
    rows.foreach { case (lang, obs, p, _, sel) =>
      assert(obs >= 0.0, s"$lang obs_stat")
      assert(p >= 1.0 / 33.0 - 1e-15 && p <= 1.0, s"$lang p=$p outside add-one range")
      assert(sel == 0 || sel == 1)
    }

    // textbook BH: k* = max{k : p_(k) <= k*alpha/m}; select ranks 1..k*
    val alpha = 0.1
    val kStar = (1 to m).filter(k => byRank(k - 1)._3 <= k * alpha / m)
      .lastOption.getOrElse(0)
    byRank.foreach { case (lang, _, _, rk, sel) =>
      assert(sel == (if (rk <= kStar) 1 else 0), s"$lang rank $rk vs k*=$kStar")
    }

    // selection is a prefix of the p-sorted order (step-up monotonicity)
    val flags = byRank.map(_._5)
    assert(!flags.dropWhile(_ == 1).contains(1), "selected set must be a rank prefix")
  }
}
