package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Local-reference checks for the round-12 operators — the
  * Round10/11OpsSpec discipline: tiny-scale inputs are collected and
  * the statistic recomputed with straight-line Scala (BigInt/Long
  * where the operator claims exactness), then compared to the
  * distributed result, giving a THIRD derivation beside the Spark
  * plan and the DuckDB oracle. */
class Round12OpsSpec extends SparkSpec {

  /** The engine-portable qlog2 fixed point, in local Long math
    * (the Round11OpsSpec helper). */
  private def qlog2(x: Long): Long = {
    require(x >= 1, s"qlog2 domain: $x")
    val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (len - 1).toLong * 1024L + (x * 1024L) / (1L << (len - 1)) - 1024L
  }

  /** Local twin of functions.DecimalDot: floor(x·y·1e14 + 0.5) exact
    * BIGINT term sum, one final division. */
  private def decDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += math.floor(a(i).toDouble * b(i).toDouble * 1e14 + 0.5).toLong
      i += 1
    }
    s.toDouble / 1e14
  }

  test("stat_kruskal_wallis matches a local exact midrank recompute") {
    import spark.implicits._
    val v = graft.Tables(spark, sf0001, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    // exact half-unit midranks on the value grid
    val grid = v.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val xs = grid.keys.toSeq.sorted
    val cum = xs.scanLeft(0L)((acc, x) => acc + grid(x))
    val mr2 = xs.zip(cum).map { case (x, below) =>
      x -> (2L * below + grid(x) + 1L) }.toMap
    val n = v.length.toLong
    val tsum = grid.values.map(t => t * t * t - t).sum
    val groups = v.groupBy(_._1)
    val sumq = groups.values.map { rows =>
      val r2 = rows.map(r => mr2(r._2)).sum
      val ns = rows.size.toLong
      math.floor(r2.toDouble * r2.toDouble / (4.0 * ns.toDouble) + 0.5).toLong
    }.sum
    val hRaw = 12.0 / (n.toDouble * (n + 1).toDouble) * sumq.toDouble -
      3.0 * (n + 1).toDouble
    val nd = n.toDouble
    val tieC = 1.0 - tsum.toDouble / (nd * nd * nd - nd)
    val got = Aggs.statKruskalWallis(spark, sf0001)
      .select($"n", $"k", $"tsum", $"h_stat", $"epsilon_sq")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got._1 == n && got._2 == groups.size.toLong && got._3 == tsum)
    assert(got._4 == hRaw / tieC, s"H ${got._4} != ${hRaw / tieC}")
    assert(got._5 == (hRaw / tieC) * (n + 1).toDouble / (nd * nd - 1.0))
    // omnibus sanity: H of a k-sample test is non-negative up to the
    // integer-resolution quantization of the group terms
    assert(got._4 > -1e-6)
  }

  test("orders_croston matches a local per-part fdiv2 fold replay") {
    import spark.implicits._
    val demand = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_partkey",
        ((year(to_date($"l_shipdate")) - 1992) * 12 +
          month(to_date($"l_shipdate"))).cast("long").as("idx"),
        round($"l_quantity").cast("long").as("q"))
      .groupBy($"l_partkey", $"idx")
      .agg((sum($"q") * 1024L).as("qq"))
      .as[(Long, Long, Long)].collect()
    def fdiv2(a: Long): Long = { val e = a - ((a % 2 + 2) % 2); e / 2 }
    val expected = demand.groupBy(_._1).view.mapValues { rows =>
      val ser = rows.sortBy(_._2)
      var z = 0L; var p = 0L; var prev = 0L; var nd = 0L; var init = false
      ser.foreach { case (_, idx, qq) =>
        if (!init) { z = qq; p = 1024L; prev = idx; nd = 1; init = true }
        else {
          z = fdiv2(qq + z)
          p = fdiv2((idx - prev) * 1024L + p)
          prev = idx; nd += 1
        }
      }
      (nd, z, p)
    }.toMap
    val got = Calendar.croston(spark, sf0001)
      .select($"l_partkey", $"n_demands", $"size_q", $"interval_q", $"croston")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (pk, nd, zq, pq, f) =>
      val (end, ez, ep) = expected(pk)
      assert(nd == end && zq == ez && pq == ep,
        s"part $pk: ($nd,$zq,$pq) != ($end,$ez,$ep)")
      assert(f == zq.toDouble / pq.toDouble)
      assert(pq >= 1024L, s"part $pk: smoothed interval below 1 period")
    }
  }

  test("embed_silhouette matches a local fixed-point recompute; scores bounded") {
    import spark.implicits._
    val vecs = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    // centroids: the kmeansAssign fixed-point mean per dimension
    val cent = vecs.groupBy(_._2).view.mapValues { rows =>
      val dim = rows.head._3.length
      Array.tabulate(dim) { d =>
        val s = rows.map(r =>
          math.floor(r._3(d).toDouble * 1e12 + 0.5).toLong).sum
        (s.toDouble / 1e12 / rows.size).toFloat
      }
    }.toMap
    // NOTE: the operator's centroid array is ARRAY<DOUBLE>; replicate
    // the decimal_dot over (float vec, double centroid) exactly
    def decDotFD(a: Array[Float], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) {
        s += math.floor(a(i).toDouble * b(i) * 1e14 + 0.5).toLong; i += 1
      }
      s.toDouble / 1e14
    }
    val centD = vecs.groupBy(_._2).view.mapValues { rows =>
      val dim = rows.head._3.length
      Array.tabulate(dim) { d =>
        val s = rows.map(r =>
          math.floor(r._3(d).toDouble * 1e12 + 0.5).toLong).sum
        s.toDouble / 1e12 / rows.size
      }
    }.toMap
    def dotDD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) {
        s += math.floor(a(i) * b(i) * 1e14 + 0.5).toLong; i += 1
      }
      s.toDouble / 1e14
    }
    val labels = centD.keys.toSeq.sorted
    val perLabel = vecs.groupBy(_._2).view.mapValues { rows =>
      val qs = rows.map { case (_, lab, e) =>
        def d(c: Array[Double]): Double =
          decDot(e, e) - 2 * decDotFD(e, c) + dotDD(c, c)
        val a = math.sqrt(d(centD(lab)))
        val b = math.sqrt(labels.filter(_ != lab).map(l => d(centD(l))).min)
        val s = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
        (math.floor(a * 1e9 + 0.5).toLong, math.floor(b * 1e9 + 0.5).toLong,
          math.floor(s * 1e9 + 0.5).toLong)
      }
      val nv = rows.size.toLong
      (nv, qs.map(_._1).sum.toDouble / 1e9 / nv,
        qs.map(_._2).sum.toDouble / 1e9 / nv,
        qs.map(_._3).sum.toDouble / 1e9 / nv)
    }.toMap
    val got = graft.llm.Similarity.silhouette(spark, sf0001)
      .select($"label", $"n_vectors", $"mean_a", $"mean_b",
        $"mean_silhouette")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == labels)
    got.foreach { case (lab, nv, ma, mb, ms) =>
      val (en, ea, eb, es) = perLabel(lab)
      assert(nv == en)
      assert(ma == ea && mb == eb && ms == es,
        s"label $lab: ($ma,$mb,$ms) != ($ea,$eb,$es)")
      assert(ms >= -1.0 - 1e-9 && ms <= 1.0 + 1e-9)
    }
    assert(cent.nonEmpty) // silence unused warning path
  }

  test("embed_ann_ndcg matches a local DCG over the engine's cells; ndcg in [0,1]") {
    import spark.implicits._
    val vecs = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    val cells = graft.llm.Similarity.autoKAssign(spark, sf0001)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val w = (1 to 10).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)
    val idcg = (1 to 10).map(i => (11 - i).toLong * w(i - 1)).sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      decDot(a, b) / math.sqrt(decDot(a, a) * decDot(b, b))
    val probes = vecs.keys.filter(_ < 5).toSeq.sorted
    val expected = probes.map { q =>
      val qe = vecs(q)
      def rank(ids: Iterable[Long]): Seq[Long] =
        ids.toSeq.map(m => (m, cos(vecs(m), qe)))
          .sortBy { case (m, c) => (-c, m) }.map(_._1).take(10)
      val truth = rank(vecs.keys.filter(_ != q))
      val rel = truth.zipWithIndex.map { case (m, i) => m -> (10L - i) }.toMap
      val approx = rank(cells.collect {
        case (m, c) if m != q && c == cells(q) => m })
      val dcg = approx.zipWithIndex.map { case (m, i) =>
        rel.getOrElse(m, 0L) * w(i) }.sum
      val hits = approx.count(rel.contains)
      q -> (hits.toLong, dcg, dcg.toDouble / idcg.toDouble)
    }.toMap
    val got = graft.llm.Similarity.annNdcg(spark, sf0001)
      .select($"q_id", $"true10_hits", $"dcg_q", $"ndcg")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == probes)
    got.foreach { case (q, hits, dcg, ndcg) =>
      val (eh, ed, en) = expected(q)
      assert(hits == eh && dcg == ed && ndcg == en,
        s"q$q: ($hits,$dcg,$ndcg) != ($eh,$ed,$en)")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12)
    }
  }

  test("events_ab_bayes matches a local order-statistic replay") {
    import spark.implicits._
    val users = graft.Tables(spark, sf0001, "events")
      .select(($"user_id" % 2).cast("int").as("variant"), $"user_id",
        ($"event_type" === "purchase").cast("int").as("is_p"))
      .groupBy($"variant", $"user_id").agg(max($"is_p").as("conv"))
      .as[(Int, Long, Int)].collect()
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val byArm = users.groupBy(_._1)
    val arms = byArm.view.mapValues { rows =>
      (rows.size.toLong, rows.map(_._3.toLong).sum) }.toMap
    val draws = (0 until 2).map { variant =>
      val (_, x) = arms(variant)
      variant -> (0 until 64).map { b =>
        val us = byArm(variant).map(r =>
          u32(s"bayes:$variant:$b:${r._2}")) :+ u32(s"bayes0:$variant:$b")
        us.sorted.apply(x.toInt) // (x+1)-th smallest, 0-indexed
      }
    }.toMap
    var nBgtA = 0L; var lossA = 0L; var lossB = 0L
    (0 until 64).foreach { b =>
      val ua = draws(0)(b); val ub = draws(1)(b)
      if (ub > ua) nBgtA += 1
      lossA += math.max(ub - ua, 0L)
      lossB += math.max(ua - ub, 0L)
    }
    val got = Warehouse.abBayes(spark, sf0001)
      .select($"n_a", $"x_a", $"n_b", $"x_b", $"p_b_gt_a",
        $"exp_loss_choose_a", $"exp_loss_choose_b")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(got._1 == arms(0)._1 && got._2 == arms(0)._2)
    assert(got._3 == arms(1)._1 && got._4 == arms(1)._2)
    assert(got._5 == nBgtA.toDouble / 64.0,
      s"p_b_gt_a ${got._5} != ${nBgtA.toDouble / 64.0}")
    assert(got._6 == lossA.toDouble / 4294967296.0 / 64.0)
    assert(got._7 == lossB.toDouble / 4294967296.0 / 64.0)
  }

  test("dq_lsh_preflight counts match local histograms of the band frames") {
    import spark.implicits._
    val sig = graft.llm.Dedup.minhashSig(spark, sf0001)
      .select($"band_a", $"band_b").as[(String, String)].collect()
    def stats(keys: Seq[String]): (Long, Long, Long, Long, Long) = {
      val h = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (keys.size.toLong, h.size.toLong, h.values.max,
        h.values.map(c => c * c).sum, h.values.map(c => c * (c - 1) / 2).sum)
    }
    val expA = stats(sig.map(_._1).toSeq)
    val expB = stats(sig.map(_._2).toSeq)
    val got = graft.llm.Dedup.lshPreflight(spark, sf0001)
      .select($"family", $"band", $"n_keys", $"n_buckets", $"max_bucket",
        // DECIMAL(38,0) at the contract edge (overflow discipline);
        // exact longs at fixture scale
        $"sum_sq".cast("long"), $"cand_pairs".cast("long"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val text = got.filter(_._1 == "text_minhash").map(r =>
      r._2 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(text("band_a") == expA, s"${text("band_a")} != $expA")
    assert(text("band_b") == expB)
    // media side: 4 bands over the distinct-hash frame; every band
    // must account for the same key population
    val media = got.filter(_._1 == "media_phash")
    assert(media.length == 4)
    assert(media.map(_._3).distinct.length == 1,
      "all phash bands must see the same distinct-hash population")
    // the gate's headline invariant: predicted candidate pairs are
    // exactly Σ C(|bucket|, 2), never an estimate
    got.foreach { r => assert(r._7 >= 0 && r._6 >= r._3) }
  }

  test("stat_friedman matches a local blocked-midrank recompute") {
    import spark.implicits._
    val cells0 = graft.Tables(spark, sf0001, "orders")
      .select(trunc(to_date($"o_orderdate"), "month").as("m"),
        $"o_orderpriority".as("prio"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"m", $"prio").agg(sum($"cents").as("rev"))
      .as[(java.sql.Date, String, Long)].collect()
    val months = cells0.map(_._1.toString).distinct.sorted
    val prios = cells0.map(_._2).distinct.sorted
    val revOf = cells0.map(c => (c._1.toString, c._2) -> c._3).toMap
    // dense grid with zero-fill, within-block half-unit midranks
    val r2 = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    var a4 = 0L
    months.foreach { m =>
      val vals = prios.map(p => p -> revOf.getOrElse((m, p), 0L))
      val byV = vals.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val sortedV = byV.keys.toSeq.sorted
      var below = 0L
      sortedV.foreach { v =>
        val t = byV(v).size.toLong
        val mr2 = 2 * below + t + 1
        byV(v).foreach { p => r2(p) += mr2; a4 += mr2 * mr2 }
        below += t
      }
    }
    val n = months.size.toLong; val k = prios.size.toLong
    val sdev = prios.map { p =>
      val d = r2(p) - n * (k + 1); d * d }.sum
    val num = (k - 1) * sdev
    val den = a4 - n * k * (k + 1) * (k + 1)
    val got = Aggs.statFriedman(spark, sf0001)
      .select($"n_blocks", $"k", $"chi2_num", $"chi2_den", $"chi2_f",
        $"kendalls_w")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(got._1 == n && got._2 == k)
    assert(got._3 == num && got._4 == den,
      s"(${got._3},${got._4}) != ($num,$den)")
    assert(got._5 == num.toDouble / den.toDouble)
    assert(got._5 >= 0.0 && got._6 >= 0.0 && got._6 <= 1.0 + 1e-12)
  }

  test("events_uplift_qini matches a local ranked-decile recompute") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf0001, "events")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val users = ev.groupBy(_._1).view.mapValues { rows =>
      val treated = (rows.head._1 % 2).toInt
      val conv = if (rows.exists(_._2 == "purchase")) 1L else 0L
      val score = rows.filter(_._2 != "purchase")
        .map(r => math.round(r._3 * 100)).sum
      (treated, conv, score)
    }.toMap
    val n = users.size.toLong
    val sorted = users.toSeq.sortBy { case (uid, (_, _, s)) => (-s, uid) }
    val agg = Array.fill(10)((0L, 0L, 0L, 0L))
    sorted.zipWithIndex.foreach { case ((_, (t, c, _)), i) =>
      val d = (i.toLong * 10 / n).toInt
      val (nt, xt, nc, xc) = agg(d)
      agg(d) =
        if (t == 1) (nt + 1, xt + c, nc, xc) else (nt, xt, nc + 1, xc + c)
    }
    var (cnt, cxt, cnc, cxc) = (0L, 0L, 0L, 0L)
    val expected = (0 until 10).map { d =>
      val (nt, xt, nc, xc) = agg(d)
      cnt += nt; cxt += xt; cnc += nc; cxc += xc
      val qini =
        if (cnc == 0) None
        else Some(cxt.toDouble - cxc.toDouble * cnt.toDouble / cnc.toDouble)
      (d, cnt, cxt, cnc, cxc, qini)
    }
    val got = Warehouse.upliftQini(spark, sf0001)
      .select($"decile", $"n_t", $"x_t", $"n_c", $"x_c", $"qini")
      .as[(Int, Long, Long, Long, Long, Option[Double])].collect()
    assert(got.length == 10)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"decile ${g._1}: $g != $e")
    }
    // the full-population decile must recover the plain ATE direction
    val last = got.last
    assert(last._2 + last._4 == n)
  }

  test("parts_abc_xyz matches a local exact-integer CV recompute") {
    import spark.implicits._
    val demand = graft.Tables(spark, sf0001, "lineitem")
      .select($"l_partkey",
        ((year(to_date($"l_shipdate")) - 1992) * 12 +
          month(to_date($"l_shipdate"))).cast("long").as("idx"),
        round($"l_quantity").cast("long").as("q"))
      .groupBy($"l_partkey", $"idx").agg(sum($"q").as("mq"))
      .as[(Long, Long, Long)].collect()
    val n = demand.map(_._2).distinct.length.toLong
    val expected = demand.groupBy(_._1).view.mapValues { rows =>
      val s = rows.map(_._3).sum
      val q2 = rows.map(r => r._3 * r._3).sum
      val num = n * q2 - s * s
      val den = s * s
      val cls = if (4 * num < den) "X" else if (num < den) "Y" else "Z"
      (rows.length.toLong, s, cls, num.toDouble / den.toDouble)
    }.toMap
    val got = Warehouse.abcXyz(spark, sf0001)
      .select($"l_partkey", $"abc_class", $"xyz_class", $"demand_months",
        $"total_qty", $"cv2")
      .as[(Long, String, String, Long, Long, Double)].collect()
    assert(got.length == expected.size)
    // the ABC leg is abcParts verbatim — cross-check against it
    val abc = Warehouse.abcParts(spark, sf0001)
      .select($"l_partkey", $"abc_class").as[(Long, String)].collect().toMap
    got.foreach { case (pk, a, x, dm, tq, cv2) =>
      val (edm, es, ex, ecv2) = expected(pk)
      assert(a == abc(pk))
      assert(x == ex && dm == edm && tq == es, s"part $pk: ($x,$dm,$tq)")
      assert(cv2 == ecv2)
      assert(cv2 >= 0.0, "CV^2 is non-negative with zero months counted")
    }
  }

  test("media_wav_fingerprint matches a local replay of the waveform rule") {
    import spark.implicits._
    // the fixture's generation rule (proven decoder-equal by
    // media_wav_haar): sample(doc, i) = ((doc*2654435761 + i*40503)
    // % 65536) - 32768 — fingerprint recomputed from it directly,
    // giving writer → JDK decoder → per-frame Haar → bit packing a
    // straight-line third derivation
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect()
    def localFp(doc: Long): Long = {
      val e = Array.ofDim[Long](8, 5)
      for (f <- 0 until 8) {
        var cur = Array.tabulate(32) { j =>
          val i = 32L * f + j
          ((doc * 2654435761L + i * 40503L) % 65536L) - 32768L
        }
        for (lvl <- 0 until 5) {
          val half = cur.length / 2
          val nxt = new Array[Long](half)
          var en = 0L
          for (j <- 0 until half) {
            val d = cur(2 * j) - cur(2 * j + 1)
            nxt(j) = cur(2 * j) + cur(2 * j + 1)
            en += d * d
          }
          e(f)(lvl) = en; cur = nxt
        }
      }
      var fp = 0L
      for (f <- 1 until 8; b <- 0 until 4)
        if ((e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1)) > 0)
          fp |= 1L << ((f - 1) * 4 + b)
      fp
    }
    val expected = docs.map(d => d -> localFp(d)).toMap
    val fams = expected.groupBy(_._2).view.mapValues(_.keys.min).toMap
    val got = graft.multimodal.Media.wavFingerprintQuery(spark, sf0001)
      .select($"doc_id", $"fp", $"family", $"is_keeper")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == docs.length)
    got.foreach { case (d, fp, fam, keep) =>
      assert(fp == expected(d), s"doc $d: fp $fp != ${expected(d)}")
      assert(fam == fams(fp))
      assert(keep == (d == fam))
    }
  }

  test("graph_adamic_adar matches a local qlog2-weighted wedge recompute") {
    import spark.implicits._
    val pairs = graft.llm.Dedup.neardupPairs(spark, sf0001)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def w(deg: Long): Long = 1000000000000L / qlog2(deg)
    val scores = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    adj.foreach { case (z, nbrs) =>
      if (nbrs.size >= 2) {
      val wz = w(nbrs.size.toLong)
      for (x <- nbrs; y <- nbrs if x < y) {
        val (cn, aa) = scores((x, y)); scores((x, y)) = (cn + 1, aa + wz)
      }
      }
    }
    val expected = scores.toSeq
      .sortBy { case ((x, y), (_, aa)) => (-aa, x, y) }.take(20)
      .map { case ((x, y), (cn, aa)) =>
        (x, y, cn, aa, if (edges((x, y))) 1 else 0) }
    val got = graft.llm.Cluster.adamicAdar(spark, sf0001)
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == expected, s"top rows: got ${got.take(3)} vs ${expected.take(3)}")
    // degree-discount law: a pair's AA weight never exceeds cn * w(2)
    got.foreach { case (_, _, cn, aa, _) => assert(aa <= cn * w(2)) }
  }

  test("media_wav_neardup matches a local band + popcount replay") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect()
    // localFp from the waveform rule, as in the fingerprint test
    def localFp(doc: Long): Long = {
      val e = Array.ofDim[Long](8, 5)
      for (f <- 0 until 8) {
        var cur = Array.tabulate(32) { j =>
          val i = 32L * f + j
          ((doc * 2654435761L + i * 40503L) % 65536L) - 32768L
        }
        for (lvl <- 0 until 5) {
          val half = cur.length / 2
          val nxt = new Array[Long](half)
          var en = 0L
          for (j <- 0 until half) {
            val d = cur(2 * j) - cur(2 * j + 1)
            nxt(j) = cur(2 * j) + cur(2 * j + 1)
            en += d * d
          }
          e(f)(lvl) = en; cur = nxt
        }
      }
      var fp = 0L
      for (f <- 1 until 8; b <- 0 until 4)
        if ((e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1)) > 0)
          fp |= 1L << ((f - 1) * 4 + b)
      fp
    }
    val reps = docs.map(d => d -> localFp(d))
      .groupBy(_._2).view.mapValues(_.map(_._1).min)
      .toSeq.map { case (fp, rep) => (rep, fp) }
    val expected = (for {
      (r1, f1) <- reps
      (r2, f2) <- reps
      if r1 < r2
      if (0 until 4).exists(i => ((f1 >> (7 * i)) & 127) == ((f2 >> (7 * i)) & 127))
      h = java.lang.Long.bitCount(f1 ^ f2)
      if h <= 6
    } yield (r1, r2, h)).toSet
    val got = graft.multimodal.Media.wavNeardup(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected, s"${got.size} pairs vs expected ${expected.size}")
    assert(expected.nonEmpty, "fixture must produce near-dup audio pairs")
  }

  test("dedup_lsh_indexed equals a self-contained delta band probe") {
    import spark.implicits._
    val sig = graft.llm.Dedup.minhashSig(spark, sf0001)
      .join(graft.Tables(spark, sf0001, "documents")
        .select($"doc_id", $"source"), "doc_id")
      .select($"doc_id", $"source", $"sig0", $"sig1", $"sig2", $"sig3",
        $"band_a", $"band_b")
      .as[(Long, String, String, String, String, String, String, String)]
      .collect()
    val ms = sig.map(_._2).max
    val delta = sig.filter(_._2 == ms)
    val standing = sig.filter(_._2 != ms)
    val expected = (for {
      n <- delta
      i <- standing
      if n._7 == i._7 || n._8 == i._8
    } yield {
      val est = (Seq(n._3 == i._3, n._4 == i._4, n._5 == i._5,
        n._6 == i._6).count(identity)) / 4.0
      (n._1, i._1, est)
    }).toSet
    val got = graft.llm.Dedup.lshIndexed(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"${got.size} pairs vs expected ${expected.size}")
    assert(expected.nonEmpty, "fixture must produce cross-feed collisions")
  }
}
