package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Local-reference checks for the round-11 operators — the
  * Round10OpsSpec discipline: tiny-scale inputs are collected and the
  * statistic recomputed with straight-line Scala (BigInt/Long where
  * the operator claims exactness), then compared to the distributed
  * result, giving a THIRD derivation beside the Spark plan and the
  * DuckDB oracle. */
class Round11OpsSpec extends SparkSpec {

  /** The engine-portable qlog2 fixed point, in local Long math. */
  private def qlog2(x: Long): Long = {
    require(x >= 1, s"qlog2 domain: $x")
    val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (len - 1).toLong * 1024L + (x * 1024L) / (1L << (len - 1)) - 1024L
  }

  test("events_attrib_removal matches a local absorbing-chain power iteration; credits are a distribution") {
    import spark.implicits._
    // local journey construction, identical contract
    val ev = graft.Tables(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .orderBy($"user_id", $"ts", $"event_id")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    // Sort by full-precision Timestamp (compareTo covers nanos), then
    // event_id — matching the operator's (ts, event_id) ordering so a
    // future sub-millisecond fixture can't order differently here.
    val tsOrd: Ordering[java.sql.Timestamp] = (a, b) => a.compareTo(b)
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2, e._3))(Ordering.Tuple2(tsOrd, Ordering.Long))
        .map(_._4).toList)
    val transitions = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    byUser.foreach { case (_, types) =>
      val cut = types.indexOf("purchase")
      val journey =
        if (cut >= 0) types.take(cut) :+ "CONV" else types
      val chain = "START" :: journey
      chain.zip(chain.tail).foreach(t => transitions(t) += 1)
      if (cut < 0) transitions((chain.last, "NULL")) += 1
    }
    val fromTot = transitions.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val p = transitions.map { case ((a, b), n) =>
      (a, b) -> n.toDouble / fromTot(a).toDouble }.toMap
    val channels = p.keys.map(_._1).filter(_ != "START").toSeq.sorted
    def absorb(removed: Option[String]): Long = {
      val states = p.keys.map(_._1).filterNot(removed.contains).toSeq
      var a = states.map(_ -> 0L).toMap
      for (_ <- 1 to 8) {
        a = states.map { s =>
          s -> p.collect {
            case ((`s`, nx), pv) =>
              val x =
                if (nx == "CONV") 1e9
                else if (nx == "NULL" || removed.contains(nx)) 0.0
                else a.getOrElse(nx, 0L).toDouble
              math.floor(pv * x + 0.5).toLong
          }.sum
        }.toMap
      }
      a("START")
    }
    val full = absorb(None)
    val expected = channels.map(c => c -> (full - absorb(Some(c)))).toMap
    val got = Attribution.removalAttribution(spark, sf0001)
      .select($"channel", $"removal_conv_ppb", $"full_conv_ppb",
        $"re_ppb", $"credit")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(got.map(_._1).toSeq == channels)
    got.foreach { case (c, _, f, re, _) =>
      assert(f == full, s"full_conv_ppb $f != $full")
      assert(re == expected(c), s"$c: re_ppb $re != ${expected(c)}")
      assert(re >= 0, s"$c: removal effect must be non-negative")
    }
    val sumRe = got.map(_._4).sum
    if (sumRe > 0) {
      val creditSum = got.flatMap(_._5).sum
      assert(math.abs(creditSum - 1.0) < 1e-12,
        s"credits must sum to 1, got $creditSum")
    }
  }

  test("graph_hits_bipartite matches a local BigInt HITS; scores stay a sub-distribution") {
    import spark.implicits._
    val edges = graft.Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables(spark, sf0001, "lineitem")
        .select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey", $"l_partkey").agg(count(lit(1)).as("w"))
      .as[(Long, Long, Long)].collect()
    val custs = edges.map(_._1).distinct.sorted
    var h = custs.map(_ -> BigInt(1000000000L / custs.length)).toMap
    var a = Map.empty[Long, BigInt]
    def normalize(num: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = num.values.sum
      num.view.mapValues(n => n * 1000000000L / tot).toMap
    }
    for (_ <- 1 to 3) {
      a = normalize(edges.groupBy(_._2).view.mapValues(
        _.map(e => BigInt(e._3) * h(e._1)).sum).toMap)
      h = normalize(edges.groupBy(_._1).view.mapValues(
        _.map(e => BigInt(e._3) * a(e._2)).sum).toMap)
    }
    val got = graft.llm.Cluster.hitsBipartite(spark, sf0001)
      .select($"entity", $"id", $"score_ppb")
      .as[(String, Long, Long)].collect()
    got.foreach {
      case ("customer", id, s) =>
        assert(BigInt(s) == h(id), s"hub $id: $s != ${h(id)}")
      case ("part", id, s) =>
        assert(BigInt(s) == a(id), s"auth $id: $s != ${a(id)}")
      case other => fail(s"unexpected entity row $other")
    }
    // L1 normalization: each side sums to <= 1e9 (floor losses only)
    assert(h.values.sum <= 1000000000L && a.values.sum <= 1000000000L)
    assert(h.values.sum > 999000000L, "hub mass lost beyond floor slack")
  }

  test("orders_mann_kendall matches a brute-force pair count") {
    import spark.implicits._
    val m = graft.Tables(spark, sf0001, "orders")
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("mo"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("x"))
      .select((($"y" * 12) + $"mo").as("t"), $"x")
      .as[(Int, Long)].collect().sortBy(_._1)
    var s = 0L
    for (i <- m.indices; j <- (i + 1) until m.length)
      s += java.lang.Long.signum(m(j)._2 - m(i)._2)
    val n = m.length.toLong
    val tie = m.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie
    val row = Calendar.mannKendall(spark, sf0001)
      .select($"n_months", $"s_stat", $"var18", $"z")
      .as[(Long, Long, Long, Double)].head()
    assert(row._1 == n && row._2 == s && row._3 == var18)
    val zExp =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    assert(row._4 == zExp, s"z ${row._4} != $zExp")
  }

  test("events_ab_sprt matches a local qlog2 likelihood ledger; decisions agree with the integer boundary") {
    import spark.implicits._
    val rows = Warehouse.abSprt(spark, sf0001)
      .select($"n_cum", $"k_cum", $"llr_q", $"decision")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val up = qlog2(6) - qlog2(5)
    val down = qlog2(4) - qlog2(5)
    val bound = qlog2(19)
    rows.foreach { case (nn, k, q, d) =>
      assert(q == k * up + (nn - k) * down, s"llr_q $q mismatch")
      val expected =
        if (q >= bound) "accept_h1"
        else if (q <= -bound) "accept_h0"
        else "continue"
      assert(d == expected, s"decision $d != $expected at llr_q $q")
    }
    // cumulative counts are monotone
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("dedup_cluster_nmi_ari matches a local BigInt recomputation on the collected contingency") {
    import spark.implicits._
    val members = graft.llm.Cluster.clusters(spark, sf0001)
      .filter($"cluster_size" > 1)
      .join(graft.Tables(spark, sf0001, "documents")
        .select($"doc_id", $"lang"), "doc_id")
      .select($"cluster_id", $"lang").as[(Long, String)].collect()
    assert(members.nonEmpty, "fixture must have multi-doc clusters")
    val ct = members.groupBy(identity).view.mapValues(_.length.toLong)
    val ac = members.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val bl = members.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = members.length.toLong
    // Decomposed sum-of-logs form: every qlog2 argument is a single
    // count <= n, so the reference stays in Long at any corpus size
    // (product forms n*nck / a*b overflow past n ~ 3e9).
    val iq = ct.map { case ((c, l), nck) =>
      nck * ((qlog2(n) + qlog2(nck)) - (qlog2(ac(c)) + qlog2(bl(l)))) }.sum
    val hcq = ac.values.map(a => a * (qlog2(n) - qlog2(a))).sum
    val hlq = bl.values.map(b => b * (qlog2(n) - qlog2(b))).sum
    def c2(x: Long): BigInt = BigInt(x) * (x - 1) / 2
    val sck = ct.values.map(c2).sum
    val sa = ac.values.map(c2).sum
    val sb = bl.values.map(c2).sum
    val t = c2(n)
    val row = graft.llm.Cluster.clusterNmiAri(spark, sf0001)
      .selectExpr("n_docs", "i_q", "hc_q", "hl_q", "s_ck", "s_a", "s_b",
        "t_pairs", "nmi", "ari")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long,
        Option[Double], Option[Double])].head()
    assert(row._1 == n && row._2 == iq && row._3 == hcq && row._4 == hlq)
    assert(BigInt(row._5) == sck && BigInt(row._6) == sa &&
      BigInt(row._7) == sb && BigInt(row._8) == t)
    row._9.foreach { nmi =>
      assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9,
        s"NMI out of range: $nmi")
    }
    row._10.foreach { ari =>
      assert(ari >= -1.0 - 1e-9 && ari <= 1.0 + 1e-9,
        s"ARI out of range: $ari")
      val num = 2 * (t * sck - sa * sb)
      val den = t * (sa + sb) - 2 * sa * sb
      if (den != 0)
        assert(ari == num.toDouble / den.toDouble, "ARI assembly mismatch")
    }
  }

  test("embed_intrinsic_dim is internally consistent and in the ambient range") {
    import spark.implicits._
    val row = graft.llm.Similarity.intrinsicDim(spark, sf0001)
      .selectExpr("n_points", "sum_xq", "sxx", "sxy", "id_cdf", "id_mle")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .head()
    assert(row._1 > 0, "no valid two-NN points at sf0.001")
    row._5.foreach { idCdf =>
      assert(idCdf == (2.0 * row._4.toDouble) / row._3.toDouble)
      assert(idCdf > 0.0 && idCdf <= 64.0,
        s"CDF-slope ID outside ambient range: $idCdf")
    }
    row._6.foreach { idMle =>
      assert(idMle ==
        (2048.0 * row._1.toDouble) / (0.6931471805599453 * row._2.toDouble))
      assert(idMle > 0.0 && idMle <= 64.0,
        s"MLE ID outside ambient range: $idMle")
    }
  }
}
