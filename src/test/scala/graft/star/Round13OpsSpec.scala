package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Local-reference checks for the round-13 operators — the
  * Round10/11/12OpsSpec discipline: tiny-scale inputs are collected
  * and the statistic recomputed with straight-line Scala
  * (BigInt/Long where the operator claims exactness), then compared
  * to the distributed result, giving a THIRD derivation beside the
  * Spark plan and the DuckDB oracle. */
class Round13OpsSpec extends SparkSpec {

  /** Per-user purchase-revenue cents at sf0.001 (the Welch/effect-size
    * metric frame), keyed by (variant, user). */
  private lazy val userCents: Seq[(Int, Long)] = {
    import spark.implicits._
    graft.Tables(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase",
        round($"value" * 100).cast("long")).otherwise(0L)).as("y"))
      .select(($"user_id" % 2).cast("int"), $"y")
      .as[(Int, Long)].collect().toSeq
  }

  test("stat_welch_ttest matches a local exact-moment recompute") {
    import spark.implicits._
    def m(v: Int): (Long, BigInt, BigInt) = {
      val ys = userCents.filter(_._1 == v).map(_._2)
      (ys.size.toLong, ys.map(BigInt(_)).sum,
        ys.map(y => BigInt(y) * BigInt(y)).sum)
    }
    val (n0, s0b, q0b) = m(0); val (n1, s1b, q1b) = m(1)
    val (s0, q0) = (BigDecimal(s0b).toDouble, BigDecimal(q0b).toDouble)
    val (s1, q1) = (BigDecimal(s1b).toDouble, BigDecimal(q1b).toDouble)
    val mean0 = s0 / n0.toDouble; val mean1 = s1 / n1.toDouble
    val se0sq = (q0 - s0 * s0 / n0.toDouble) / (n0 - 1).toDouble / n0.toDouble
    val se1sq = (q1 - s1 * s1 / n1.toDouble) / (n1 - 1).toDouble / n1.toDouble
    val t = (mean1 - mean0) / math.sqrt(se0sq + se1sq)
    val df = (se0sq + se1sq) * (se0sq + se1sq) /
      (se0sq * se0sq / (n0 - 1).toDouble + se1sq * se1sq / (n1 - 1).toDouble)
    val got = Warehouse.welchTTest(spark, sf0001)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got == ((n0, n1, mean0, mean1, t, df)))
  }

  test("stat_mcnemar matches a local 2x2 discordance recompute") {
    import spark.implicits._
    val cells = graft.Tables(spark, sf0001, "events")
      .select($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).values.map { rows =>
        val x1 = rows.exists(r => r._2 == "purchase" && r._3 % 2 == 0)
        val x2 = rows.exists(r => r._2 == "purchase" && r._3 % 2 == 1)
        (x1, x2)
      }.toSeq
    val n11 = cells.count(c => c._1 && c._2).toLong
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val n00 = cells.count(x => !x._1 && !x._2).toLong
    val chi2 =
      if (b + c == 0) None
      else {
        val num = math.max(math.abs(b - c) - 1, 0L)
        Some(num.toDouble * num.toDouble / (b + c).toDouble)
      }
    val got = Warehouse.mcnemar(spark, sf0001)
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((n11, b, c, n00, chi2)))
  }

  test("stat_cochran_q matches a local blocked-binary recompute") {
    import spark.implicits._
    val cells0 = graft.Tables(spark, sf0001, "orders")
      .select(trunc(to_date($"o_orderdate"), "month").cast("string"),
        $"o_orderpriority",
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => BigInt(r._3)).sum).toMap
    val months = cells0.keys.map(_._1).toSeq.distinct
    val prios = cells0.keys.map(_._2).toSeq.distinct
    val k = prios.size.toLong
    // dense grid, outcome = rev*k >= month total (exact integers)
    val x = (for (m <- months; p <- prios) yield {
      val rev = cells0.getOrElse((m, p), BigInt(0))
      val mtot = prios.map(q => cells0.getOrElse((m, q), BigInt(0))).sum
      ((m, p), if (rev * k >= mtot) 1L else 0L)
    }).toMap
    val rSums = months.map(m => prios.map(p => x((m, p))).sum)
    val cSums = prios.map(p => months.map(m => x((m, p))).sum)
    val t = rSums.sum
    val qNum = (k - 1) * (k * cSums.map(c => c * c).sum - t * t)
    val qDen = k * t - rSums.map(r => r * r).sum
    val qStat = if (qDen == 0) None
      else Some(qNum.toDouble / qDen.toDouble)
    val got = Aggs.statCochranQ(spark, sf0001)
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((months.size.toLong, k, qNum, qDen, qStat)))
  }

  test("orders_newsvendor matches local exact order statistics") {
    import spark.implicits._
    val d = graft.Tables(spark, sf0001, "lineitem")
      .join(graft.Tables(spark, sf0001, "part")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .select($"p_brand", round($"l_quantity").cast("long"))
      .as[(String, Long)].collect()
    val expected = d.groupBy(_._1).map { case (brand, rows) =>
      val qs = rows.map(_._2).sorted
      val n = qs.size.toLong
      def lvl(l: Long): Long = {
        // smallest q with 100*cum >= l*n over the sorted multiset
        var cum = 0L
        qs.distinct.map { q =>
          cum = qs.count(_ == q) + cum; (q, cum)
        }.find { case (_, c) => c * 100 >= l * n }.get._1
      }
      brand -> ((n, lvl(50), lvl(80), lvl(95),
        qs.sum.toDouble / n.toDouble))
    }
    val got = Calendar.newsvendor(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (brand, n, q50, q80, q95, mean) =>
      assert(expected(brand) == ((n, q50, q80, q95, mean)), brand)
    }
  }

  test("parts_eoq matches a local exact-moment recompute") {
    import spark.implicits._
    val dem = graft.Tables(spark, sf0001, "lineitem")
      .join(graft.Tables(spark, sf0001, "part")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .select($"p_brand", round($"l_quantity").cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val price = graft.Tables(spark, sf0001, "part")
      .select($"p_brand", round($"p_retailprice" * 100).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum))
      .toMap
    val got = Calendar.partsEoq(spark, sf0001)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    got.foreach { case (brand, dU, nParts, h, eoq, nOrd) =>
      val (np, cents) = price(brand)
      val hExp = cents.toDouble / np.toDouble / 5.0
      val eoqExp = math.sqrt(2.0 * dem(brand).toDouble * 10000.0 / hExp)
      assert(dU == dem(brand) && nParts == np && h == hExp &&
        eoq == eoqExp && nOrd == dU.toDouble / eoqExp, brand)
    }
  }

  test("events_bass_diffusion matches a local BigInt Cramer recompute") {
    import spark.implicits._
    val firsts = graft.Tables(spark, sf0001, "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min(to_date($"ts")).cast("string").as("d"))
      .select($"d").as[String].collect()
    val daily = firsts.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val ys = daily.map(_._2)
    val xs = ys.scanLeft(0L)(_ + _).dropRight(1) // N_{t-1}
    def bsum(f: (Long, Long) => BigInt): BigInt =
      xs.zip(ys).map { case (x, y) => f(x, y) }.sum
    val n = ys.size.toLong
    val dn = n.toDouble
    val dsx = BigDecimal(bsum((x, _) => BigInt(x))).toDouble
    val dsx2 = BigDecimal(bsum((x, _) => BigInt(x) * x)).toDouble
    val dsx3 = BigDecimal(bsum((x, _) => BigInt(x) * x * x)).toDouble
    val dsx4 = BigDecimal(bsum((x, _) => BigInt(x) * x * x * x)).toDouble
    val dsy = BigDecimal(bsum((_, y) => BigInt(y))).toDouble
    val dsxy = BigDecimal(bsum((x, y) => BigInt(x) * y)).toDouble
    val dsx2y = BigDecimal(bsum((x, y) => BigInt(x) * x * y)).toDouble
    val det = dn * (dsx2 * dsx4 - dsx3 * dsx3) -
      dsx * (dsx * dsx4 - dsx2 * dsx3) +
      dsx2 * (dsx * dsx3 - dsx2 * dsx2)
    val det0 = dsy * (dsx2 * dsx4 - dsx3 * dsx3) -
      dsx * (dsxy * dsx4 - dsx2y * dsx3) +
      dsx2 * (dsxy * dsx3 - dsx2y * dsx2)
    val det1 = dn * (dsxy * dsx4 - dsx2y * dsx3) -
      dsy * (dsx * dsx4 - dsx2 * dsx3) +
      dsx2 * (dsx * dsx2y - dsx2 * dsxy)
    val det2 = dn * (dsx2 * dsx2y - dsx3 * dsxy) -
      dsx * (dsx * dsx2y - dsx3 * dsy) +
      dsy * (dsx * dsx3 - dsx2 * dsx2)
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val got = Calendar.bassDiffusion(spark, sf0001)
      .as[(Long, Long, Double, Double, Double,
        Option[Double], Option[Double], Option[Double])].head()
    assert(got._1 == n && got._2 == ys.sum)
    assert(got._3 == b0 && got._4 == b1 && got._5 == b2)
    // fixture verdict documented on the operator: upward-opening
    // quadratic => no interior saturation => NULL m/p/q
    val disc = b1 * b1 - 4.0 * b2 * b0
    if (b2 == 0.0 || disc < 0.0) assert(got._6.isEmpty)
    else assert(got._6.contains((-b1 - math.sqrt(disc)) / (2.0 * b2)))
  }

  test("dq_fd_violations matches local group-argmax recomputes") {
    import spark.implicits._
    def local(table: String, lhs: String, rhs: String): (Long, Long, Long) = {
      val rows = graft.Tables(spark, sf0001, table)
        .select(col(lhs).cast("string"), col(rhs).cast("string"))
        .as[(String, String)].collect()
      val byLhs = rows.groupBy(_._1)
      val keepable = byLhs.values
        .map(g => g.groupBy(_._2).values.map(_.size).max.toLong).sum
      (rows.length.toLong, byLhs.size.toLong, rows.length - keepable)
    }
    val exp = Map(
      "customer: c_custkey -> c_nationkey" ->
        local("customer", "c_custkey", "c_nationkey"),
      "documents: source -> lang" -> local("documents", "source", "lang"),
      "lineitem: l_partkey -> l_suppkey" ->
        local("lineitem", "l_partkey", "l_suppkey"),
      "orders: o_custkey -> o_orderpriority" ->
        local("orders", "o_custkey", "o_orderpriority"),
      "part: p_brand -> p_type" -> local("part", "p_brand", "p_type"))
    val got = Inference.fdViolations(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
    assert(got.length == exp.size)
    got.foreach { case (fd, n, nl, nv, g3, holds) =>
      val (en, enl, env) = exp(fd)
      assert((n, nl, nv) == ((en, enl, env)), fd)
      assert(g3 == env.toDouble / en.toDouble && holds == (env == 0L), fd)
    }
    // the key-implied FD must hold; the fact-grain rules must not
    assert(got.find(_._1.startsWith("customer:")).get._6)
    assert(!got.find(_._1.startsWith("lineitem:")).get._6)
  }

  test("dedup_route_audit equals the decision rule applied to the gate") {
    import spark.implicits._
    val pf = graft.llm.Dedup.lshPreflight(spark, sf0001)
      .selectExpr("family", "band", "n_keys", "n_buckets", "max_bucket",
        "CAST(sum_sq AS BIGINT)", "CAST(cand_pairs AS BIGINT)")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val budget = graft.llm.Dedup.RoutePairBudgetPerKey
    val exp = pf.groupBy(_._1).map { case (fam, rows) =>
      val nKeys = rows.map(_._3).max
      val total = rows.map(_._7).sum
      val hot = rows.filter(_._7 == rows.map(_._7).max).map(_._2).min
      fam -> ((nKeys, rows.length.toLong, total,
        rows.map(_._5).max, hot, nKeys * budget,
        if (total <= nKeys * budget) "pairwise_banding"
        else "coarse_contraction"))
    }
    val got = graft.llm.Dedup.routeAudit(spark, sf0001)
      .selectExpr("family", "n_keys", "n_bands",
        "CAST(cand_pairs_total AS BIGINT)", "max_bucket", "hot_band",
        "CAST(pair_budget AS BIGINT)", "route")
      .as[(String, Long, Long, Long, Long, String, Long, String)]
      .collect()
    assert(got.length == 4) // text + phash + wav + embed families all priced
    got.foreach { case (fam, nk, nb, cp, mb, hot, bud, route) =>
      assert(exp(fam) == ((nk, nb, cp, mb, hot, bud, route)), fam)
    }
  }

  test("media_wav_semdedup equals local cell grouping of fingerprints") {
    import spark.implicits._
    val fps = graft.multimodal.Media.wavFps(spark, sf0001)
      .as[(Long, Long)].collect()
    val fams = fps.groupBy(_._2).map { case (fp, rows) =>
      fp -> (rows.map(_._1).min, rows.length.toLong)
    }
    val cells = fams.groupBy { case (fp, _) => (fp >> 21) & 127 }
      .map { case (cell, fs) =>
        cell -> ((fs.values.map(_._1).min, fs.values.map(_._2).sum,
          fs.size.toLong))
      }
    val got = graft.multimodal.Media.wavSemDedup(spark, sf0001)
      .as[(Long, Int, Long, Long, Long, Boolean)].collect()
    assert(got.length == fps.length)
    got.foreach { case (doc, cell, cid, csz, nfp, keeper) =>
      val (ecid, ecsz, enfp) = cells(cell.toLong)
      assert((cid, csz, nfp) == ((ecid, ecsz, enfp)), doc)
      assert(keeper == (doc == ecid))
    }
  }

  test("events_ab_bayes two-level rank equals a local sorted selection") {
    import spark.implicits._
    val users = graft.Tables(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(max(($"event_type" === "purchase").cast("int")).as("conv"))
      .select($"user_id", $"conv").as[(Long, Int)].collect()
    def u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val byArm = users.groupBy(u => (u._1 % 2).toInt)
    val xs = byArm.view.mapValues(_.map(_._2.toLong).sum).toMap
    // naive selection: full sort of each (arm, replicate)'s n+1 draws
    val sel = (for (v <- Seq(0, 1); b <- 0 until 64) yield {
      val draws = byArm(v).map(u => u32(s"bayes:$v:$b:${u._1}")) :+
        u32(s"bayes0:$v:$b")
      ((v, b), draws.sorted.apply(xs(v).toInt)) // (x+1)-th smallest
    }).toMap
    val nBgtA = (0 until 64).count(b => sel((1, b)) > sel((0, b))).toLong
    val lossB = (0 until 64).map(b =>
      math.max(sel((0, b)) - sel((1, b)), 0L)).sum
    val lossA = (0 until 64).map(b =>
      math.max(sel((1, b)) - sel((0, b)), 0L)).sum
    val got = Warehouse.abBayes(spark, sf0001)
      .selectExpr("p_b_gt_a", "exp_loss_choose_a", "exp_loss_choose_b")
      .as[(Double, Double, Double)].head()
    assert(got._1 == nBgtA.toDouble / 64.0)
    assert(got._2 == lossA.toDouble / 4294967296.0 / 64.0)
    assert(got._3 == lossB.toDouble / 4294967296.0 / 64.0)
  }

  /** The engine-portable qlog2 fixed point, local Long form. */
  private def qlog2(x: Long): Long = {
    require(x >= 1, s"qlog2 domain: $x")
    val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (len - 1).toLong * 1024L + (x * 1024L) / (1L << (len - 1)) - 1024L
  }

  test("media_image_entropy matches a local pixel-rule recompute") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val exp = docs.map { case (id, nc) =>
      val w = (16 + nc % 64).toInt; val h = (16 + (nc * 7) % 64).toInt
      val counts = new Array[Long](256)
      for (i <- 0 until w * h) {
        val p = (id * 2654435761L + i * 40503L) & 0xffffffL
        val luma = 299L * ((p >> 16) & 255L) + 587L * ((p >> 8) & 255L) +
          114L * (p & 255L)
        counts((luma / 1000L).toInt) += 1L
      }
      val n = (w * h).toLong
      val k = counts.count(_ > 0L).toLong
      val mc = counts.max
      val mode = counts.indexWhere(_ == mc)
      val hq = n * qlog2(n) -
        counts.filter(_ > 0L).map(c => c * qlog2(c)).sum
      id -> ((n, k, mode, hq, hq.toDouble / (n * 1024L).toDouble))
    }.toMap
    val got = graft.multimodal.Media.imageEntropy(spark, sf0001)
      .as[(Long, Long, Long, Int, Long, Double)].collect()
    assert(got.length == exp.size)
    got.foreach { case (id, n, k, mode, hq, hb) =>
      assert(exp(id) == ((n, k, mode, hq, hb)), id)
    }
  }

  test("orders_croston_tsb matches a local dense-grid fold") {
    import spark.implicits._
    def fdiv2(a: Long): Long = (a - ((a % 2 + 2) % 2)) / 2
    val demand = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_partkey",
        ((year(to_date($"l_shipdate")) - 1992) * 12 +
          month(to_date($"l_shipdate"))).cast("long"),
        round($"l_quantity").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum * 1024L).toMap
    val parts = demand.keys.map(_._1).toSeq.distinct
    val midx = demand.keys.map(_._2).max
    val exp = parts.map { pk =>
      val fidx = demand.keys.filter(_._1 == pk).map(_._2).min
      var z = 0L; var p = 0L; var nd = 0L; var init = false
      for (idx <- fidx to midx) {
        val qq = demand.getOrElse((pk, idx), -1L)
        if (!init) { z = qq; p = 1024L; nd = 1L; init = true }
        else if (qq >= 0) { z = fdiv2(qq + z); p = fdiv2(1024L + p); nd += 1 }
        else p = fdiv2(p)
      }
      pk -> ((midx - fidx + 1, nd, z, p,
        (p * z).toDouble / 1048576L.toDouble))
    }.toMap
    val got = graft.star.Calendar.crostonTsb(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == exp.size)
    got.foreach { case (pk, nm, nd, z, p, f) =>
      assert(exp(pk) == ((nm, nd, z, p, f)), pk)
    }
  }

  test("orders_safety_stock matches a local exact-moment recompute") {
    import spark.implicits._
    val rows = graft.Tables(spark, sf0001, "lineitem")
      .join(graft.Tables(spark, sf0001, "part")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .select($"p_brand", to_date($"l_shipdate").cast("string"),
        round($"l_quantity").cast("long"))
      .as[(String, String, Long)].collect()
    val nDays = {
      val ds = rows.map(_._2).distinct.sorted
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(ds.head),
        java.time.LocalDate.parse(ds.last)) + 1
    }
    val got = graft.star.Calendar.safetyStock(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    got.foreach { case (brand, nd, ad, tot, mean, sd, ss, rop) =>
      val daily = rows.filter(_._1 == brand).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).values.toSeq
      val s = daily.sum; val q = daily.map(u => u * u).sum
      assert(nd == nDays && ad == daily.size.toLong && tot == s, brand)
      val meanE = s.toDouble / nDays.toDouble
      val sdE = math.sqrt(
        (q.toDouble - s.toDouble * s.toDouble / nDays.toDouble) /
          (nDays - 1).toDouble)
      val ssE = 1.6449 * sdE * math.sqrt(7.0)
      assert(mean == meanE && sd == sdE && ss == ssE &&
        rop == 7.0 * meanE + ssE, brand)
    }
  }

  test("events_hazard_table matches a local life-table recompute") {
    import spark.implicits._
    val users = graft.Tables(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(min($"ts").cast("date").cast("string").as("f"),
        min(when($"event_type" === "purchase", $"ts")).cast("date")
          .cast("string").as("p"),
        max($"ts").cast("date").cast("string").as("l"))
      .as[(Long, String, Option[String], String)].collect()
    def days(a: String, b: String): Int =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b)).toInt
    val obs = users.map { case (_, f, p, l) =>
      p.map(d => (days(f, d), true)).getOrElse((days(f, l), false))
    }
    val ts = obs.map(_._1).distinct.sorted
    var na = 0.0
    val exp = ts.map { t =>
      val d = obs.count(o => o._1 == t && o._2).toLong
      val c = obs.count(o => o._1 == t && !o._2).toLong
      val n = obs.count(_._1 >= t).toLong
      na += d.toDouble / n.toDouble
      t -> ((n, d, c, d.toDouble / n.toDouble, na))
    }.toMap
    val got = EventWindows.hazardTable(spark, sf0001)
      .as[(Int, Long, Long, Long, Double, Double)].collect()
    assert(got.length == exp.size)
    got.foreach { case (t, n, d, c, h, ch) =>
      assert(exp(t) == ((n, d, c, h, ch)), t)
    }
  }

  test("orders_abc_migration cells partition the parts and match local classes") {
    import spark.implicits._
    val got = Warehouse.abcMigration(spark, sf0001)
      .as[(String, String, Long, Double, Boolean)].collect()
    // cells partition the part universe exactly once
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_partkey").distinct().count()
    assert(got.map(_._3).sum == li)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    got.foreach { case (a, b, _, _, st) => assert(st == (a == b)) }
    // local replay of the split + classification
    val rows = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_partkey", to_date($"l_shipdate").cast("string"),
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(28, 5)))
      .as[(Long, String, BigDecimal)].collect()
    val ds = rows.map(_._2)
    val d0 = java.time.LocalDate.parse(ds.min)
    val mid = d0.plusDays(java.time.temporal.ChronoUnit.DAYS.between(
      d0, java.time.LocalDate.parse(ds.max)) / 2)
    def classes(half: Seq[(Long, BigDecimal)]): Map[Long, String] = {
      val per = half.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (pk, c) => (-c, pk) }
      val total = per.map(_._2).sum
      var cum = BigDecimal(0)
      per.map { case (pk, c) =>
        cum += c
        pk -> (if (cum * 100 <= total * 80) "A"
               else if (cum * 100 <= total * 95) "B" else "C")
      }.toMap
    }
    val h1 = classes(rows.filter(r =>
      !java.time.LocalDate.parse(r._2).isAfter(mid)).map(r => (r._1, r._3)))
    val h2 = classes(rows.filter(r =>
      java.time.LocalDate.parse(r._2).isAfter(mid)).map(r => (r._1, r._3)))
    val exp = rows.map(_._1).distinct.map { pk =>
      (h1.getOrElse(pk, "N"), h2.getOrElse(pk, "N"))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => ((r._1, r._2), r._3)).toMap == exp)
  }

  test("graph_pseudo_diameter matches a local double sweep") {
    import spark.implicits._
    // rebuild the candidate-pair graph locally from the signatures
    // (the Round12OpsSpec band-join rederivation)
    val sig = graft.llm.Dedup.minhashSig(spark, sf0001)
      .select($"doc_id", $"band_a", $"band_b")
      .as[(Long, String, String)].collect()
    val pairs = (for {
      a <- sig; b <- sig
      if a._1 < b._1 && (a._2 == b._2 || a._3 == b._3)
    } yield (a._1, b._1)).distinct
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hub = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    def bfs(seed: Long): Map[Long, Int] = {
      var layers = Map(seed -> 0)
      var frontier = Set(seed)
      for (l <- 1 to 6) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(layers.keySet)
        layers ++= frontier.map(_ -> l)
      }
      layers
    }
    val v1 = bfs(hub)
    val far = v1.toSeq.sortBy { case (n, l) => (-l, n) }.head._1
    val v2 = bfs(far)
    val got = graft.llm.Cluster.pseudoDiameter(spark, sf0001)
      .as[(Long, Long, Int, Long, Int, Long, Boolean)].head()
    assert(got == ((hub, far, v1.values.max, v1.size.toLong,
      v2.values.max, v2.size.toLong,
      v1.values.max == 6 || v2.values.max == 6)))
  }
}
