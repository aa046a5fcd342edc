package graft.star

import graft.SparkSpec

/** Inference tier: conformal coverage laws, Brier/reliability
  * accounting, and t-closeness EMD bounds — local scalar replays of
  * the distributed formulations. */
class InferenceSpec extends SparkSpec {

  test("split conformal: radius is the exact rank-k residual and coverage ~ 1-alpha") {
    import spark.implicits._
    val got = Inference.conformal(spark, sf0001)
      .as[(String, Double, Long, Long, Double, Long, Long, Double)]
      .collect().toSeq
    assert(got.size == 5) // one row per order priority

    val orders = graft.Tables(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .as[(Long, String, Long)].collect()
    got.foreach { case (prio, mu, nTrain, nCal, q, nTest, covered, cov) =>
      val rows = orders.filter(_._2 == prio)
      val train = rows.filter(_._1 % 3 == 0)
      val calib = rows.filter(_._1 % 3 == 1)
      val test = rows.filter(_._1 % 3 == 2)
      assert(nTrain == train.size && nCal == calib.size && nTest == test.size)
      val muC = train.map(_._3).sum / train.size // floor-mean in cents
      assert(mu == muC.toDouble / 100.0)
      // exact order statistic: ceil((n+1)*0.9)-th smallest |resid|
      val resids = calib.map(r => math.abs(r._3 - muC)).sorted
      val k = ((nCal + 1) * 9 + 9) / 10
      assert(q == resids((k - 1).toInt).toDouble / 100.0)
      val cov2 = test.count(r => math.abs(r._3 - muC) <= resids((k - 1).toInt))
      assert(covered == cov2 && cov == cov2.toDouble / nTest)
      // the split-conformal marginal guarantee: coverage >= 1 - alpha
      // - small-sample slack (exact finite-sample bound is on the
      // marginal, so allow a band around 0.9 at sf0.001 sizes)
      assert(cov > 0.8 && cov <= 1.0)
    }
  }

  test("completeness profile: counts replay; key column detected by distinct ratio") {
    import spark.implicits._
    val got = Inference.completenessProfile(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 6)
    val n = graft.Tables(spark, sf0001, "orders").count()
    got.values.foreach { case (_, rn, nn, nd, nullFrac, dr) =>
      assert(rn == n && nn <= n && nd <= nn)
      assert(nullFrac == 1.0 - nn.toDouble / n)
      assert(dr == nd.toDouble / n)
    }
    // o_orderkey is the key: fully distinct; priority is low-cardinality
    assert(got("o_orderkey")._4 == n)
    assert(got("o_orderpriority")._4 == 5)
  }

  test("anova: F statistic replays from scalar moments; SS components nonnegative") {
    import spark.implicits._
    val (k, n, ssb, ssw, f) = Inference.anovaF(spark, sf0001)
      .as[(Long, Long, Double, Double, Double)].head()
    val o = graft.Tables(spark, sf0001, "orders")
      .selectExpr("o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .as[(String, Long)].collect()
    assert(k == o.map(_._1).distinct.size && n == o.length)
    val groups = o.groupBy(_._1).values.toSeq
    val sbPart = groups.map { g =>
      val s = g.map(r => BigInt(r._2)).sum
      (s * s) / g.size // exact integer quotient (the overflow-safe form)
    }.sum.toDouble
    val s = o.map(r => BigInt(r._2)).sum
    val q = o.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val ssb2 = sbPart - (s * s).toDouble / n
    val ssw2 = q.toDouble - sbPart
    assert(ssb == ssb2 && ssw == ssw2)
    assert(f == (ssb2 / (k - 1)) / (ssw2 / (n - k)))
    assert(ssb >= 0 && ssw >= 0 && f >= 0)
  }

  test("levene: Brown-Forsythe W replays from scalar medians and moments") {
    import spark.implicits._
    val (k, n, w) = Inference.levene(spark, sf0001)
      .as[(Long, Long, Double)].head()
    val o = graft.Tables(spark, sf0001, "orders")
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .as[(String, Long, Long)].collect()
    assert(k == o.map(_._1).distinct.size && n == o.length)
    val zs = o.groupBy(_._1).values.toSeq.map { g =>
      val sorted = g.sortBy(r => (r._3, r._2))
      val med = sorted(((g.size + 1) / 2 - 1).toInt)._3
      g.map(r => math.abs(r._3 - med))
    }
    val sbPart = zs.map { z =>
      val s = z.map(BigInt(_)).sum
      (s * s) / z.size // exact integer quotient (the overflow-safe form)
    }.sum.toDouble
    val s = zs.flatten.map(BigInt(_)).sum
    val q = zs.flatten.map(z => BigInt(z) * BigInt(z)).sum
    val ssb = sbPart - (s * s).toDouble / n
    val ssw = q.toDouble - sbPart
    assert(w == (ssb / (k - 1)) / (ssw / (n - k)))
    assert(w >= 0)
  }

  test("spearman: tie-broken rank correlation replays exactly; rho in [-1,1]") {
    import spark.implicits._
    val got = Inference.spearman(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val o = graft.Tables(spark, sf0001, "orders")
      .selectExpr("o_orderpriority", "o_orderkey", "o_totalprice",
        "CAST(o_orderdate AS STRING)")
      .as[(String, Long, Double, String)].collect()
    got.foreach { case (prio, n, sd2, rho) =>
      val rows = o.filter(_._1 == prio)
      assert(n == rows.length)
      val r1 = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val r2 = rows.sortBy(r => (r._4, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val d2 = rows.map { r =>
        val d = r1(r._2) - r2(r._2); d * d
      }.sum
      assert(sd2 == d2)
      val expect = 1.0 - (d2 * 6L).toDouble /
        (n.toDouble * (n.toDouble * n.toDouble - 1.0))
      assert(rho == expect)
      assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12)
    }
  }

  test("brier bins: confidence/outcome in [0,1], bin accounting closes over the corpus") {
    import spark.implicits._
    val bins = Inference.brierCalibration(spark, sf0001)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(bins.nonEmpty)
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(bins.map(_._2).sum == nDocs) // every doc lands in one bin
    bins.foreach { case (bin, n, conf, out, brier) =>
      assert(bin >= 0 && bin <= 9 && n > 0)
      assert(conf >= 0.0 && conf <= 1.0)
      assert(out >= 0.0 && out <= 1.0)
      assert(brier >= 0.0 && brier <= 1.0)
      // bin mean confidence sits inside the bin's decile (clamp top)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9)
    }
  }

  test("t-closeness: EMD in [0,1], zero iff class matches global distribution") {
    import spark.implicits._
    val got = Inference.tCloseness(spark, sf0001)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, _, n, m, t) =>
      assert(n > 0 && m > 1)
      assert(t >= 0.0 && t <= 1.0 + 1e-12)
    }
    // scalar replay of one class's EMD
    val docs = graft.Tables(spark, sf0001, "documents")
      .selectExpr("lang", "source", "n_chars div 500 AS band")
      .as[(String, String, Long)].collect()
    val bands = docs.map(_._3).distinct.sorted
    val nAll = docs.length.toLong
    val (l0, s0, ng0, _, t0) = got.head
    val cls = docs.filter(d => d._1 == l0 && d._2 == s0)
    assert(ng0 == cls.size)
    var cumG = 0L; var cumA = 0L; var acc = 0L
    bands.foreach { b =>
      cumG += cls.count(_._3 == b); cumA += docs.count(_._3 == b)
      acc += math.abs(cumG * nAll - cumA * ng0)
    }
    val expected = acc.toDouble / (ng0.toDouble * nAll * (bands.size - 1))
    assert(math.abs(t0 - expected) < 1e-12)
  }
}
