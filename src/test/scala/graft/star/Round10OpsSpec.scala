package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Local-reference checks for the round-10 flagship operators — a
  * THIRD, engine-independent derivation beside the Spark plan and the
  * DuckDB oracle: tiny-scale inputs are collected and the statistic is
  * recomputed with straight-line Scala (BigInt where the operator
  * claims exactness), then compared to the distributed result. */
class Round10OpsSpec extends SparkSpec {

  test("events_shapley_attrib matches a brute-force Shapley over collected coalitions; efficiency axiom holds") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf0001, "events")
      .select($"user_id", $"event_type")
    val channels = ev.filter($"event_type" =!= "purchase")
      .select($"event_type").distinct().as[String].collect().sorted
    val n = channels.length
    val bit = channels.zipWithIndex.toMap
    val perUser = ev.groupBy($"user_id")
      .agg(collect_set($"event_type").as("types"))
      .as[(Long, Seq[String])].collect()
    val coalitions = perUser.collect {
      case (_, types) if types.contains("purchase") =>
        types.filter(_ != "purchase").map(t => 1L << bit(t)).sum
    }
    def v(s: Long): Long = coalitions.count(m => (m & s) == m)
    def fact(k: Int): BigInt = (1 to k).foldLeft(BigInt(1))(_ * _)
    val expected = channels.map { c =>
      val b = 1L << bit(c)
      var phi = BigInt(0)
      for (s <- 0L until (1L << n) if (s & b) == 0) {
        val w = fact(java.lang.Long.bitCount(s)) *
          fact(n - java.lang.Long.bitCount(s) - 1)
        phi += w * BigInt(v(s | b) - v(s))
      }
      c -> phi
    }.toMap
    val got = Attribution.shapleyAttribution(spark, sf0001)
      .select($"channel", $"phi_num", $"n_fact", $"v_full", $"v_empty")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length == n)
    got.foreach { case (c, phi, _, _, _) =>
      assert(BigInt(phi) == expected(c), s"channel $c: $phi != ${expected(c)}")
    }
    val (_, _, nFact, vFull, vEmpty) = got.head
    assert(got.map(_._2).sum == nFact * (vFull - vEmpty),
      "efficiency axiom: sum of Shapley values must equal v(N) - v(empty)")
  }

  test("stat_auc_lpm matches a straight-line AUC over the collected scored docs") {
    import spark.implicits._
    val scored = graft.llm.Curate.lpmScored(spark, sf0001)
      .select($"pred_p", $"y").as[(Double, Long)].collect()
    val byScore = scored
      .map { case (p, y) =>
        (math.round(math.max(0.0, math.min(1.0, p)) * 1e6), y) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p6, g) =>
        (p6, g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong) }
    var negBelow = 0L
    var num2 = BigInt(0)
    byScore.foreach { case (_, pos, neg) =>
      num2 += BigInt(pos) * (2 * negBelow + neg)
      negBelow += neg
    }
    val nPos = byScore.map(_._2).sum
    val nNeg = byScore.map(_._3).sum
    val row = Inference.aucLpm(spark, sf0001)
      .select($"n_pos", $"n_neg", $"auc_num2", $"auc")
      .as[(Long, Long, Long, Double)].head()
    assert(row._1 == nPos && row._2 == nNeg)
    assert(BigInt(row._3) == num2, s"auc_num2 ${row._3} != $num2")
    assert(row._4 > 0.5 && row._4 <= 1.0,
      s"the screen must rank better than random, got AUC ${row._4}")
  }

  test("stat_hill_tail matches a local qlog2 Hill sum over collected revenues") {
    import spark.implicits._
    val cents = graft.Tables(spark, sf0001, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"c", $"o_custkey").as[(Long, Long)].collect()
      .sortBy { case (c, k) => (-c, k) }
    def qlog2(x: Long): Long = {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
      b * 1024L + (x * 1024L >> b) - 1024L
    }
    val xk1 = cents(50)._1
    val expectedSum = cents.take(50).map(t => qlog2(t._1) - qlog2(xk1)).sum
    val row = Aggs.statHillTail(spark, sf0001)
      .select($"k", $"xk1_cents", $"hill_sum_q")
      .as[(Long, Long, Long)].head()
    assert(row._1 == 50L && row._2 == xk1 && row._3 == expectedSum)
  }

  test("stat_median_ci brackets the median and the JL audit concentrates near 1") {
    import spark.implicits._
    val ci = Inference.medianCi(spark, sf0001)
      .select($"median", $"ci_lo", $"ci_hi", $"l_rk", $"u_rk", $"n")
      .as[(Double, Double, Double, Long, Long, Long)].collect()
    assert(ci.nonEmpty)
    ci.foreach { case (med, lo, hi, l, u, n) =>
      assert(lo <= med && med <= hi, s"CI [$lo,$hi] must bracket median $med")
      assert(1L <= l && l < u && u <= n)
    }
    val jl = graft.llm.Similarity.jlDistortion(spark, sf0001)
      .select($"mean_ratio", $"frac_within_2x")
      .as[(Double, Double)].head()
    assert(jl._1 > 0.7 && jl._1 < 1.3,
      s"JL mean distortion ratio should concentrate near 1, got ${jl._1}")
    assert(jl._2 > 0.7, s"JL 2x-band share too low: ${jl._2}")
  }

  test("events_attrib_credit conserves credit: per-user ppm sums land within the integer-division remainder") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf0001, "events")
    val conv = ev.filter($"event_type" === "purchase")
      .select($"user_id").distinct().as[Long].collect().toSet
    val journeys = ev.filter($"event_type" =!= "purchase")
      .filter($"user_id".isin(conv.toSeq: _*))
      .groupBy($"user_id").agg(count(lit(1)).as("j"))
      .as[(Long, Long)].collect()
    assert(journeys.nonEmpty)
    // channel-level sums from the operator
    val got = Attribution.creditAttribution(spark, sf0001)
      .select($"linear_ppm", $"ushape_ppm", $"first_touch", $"last_touch")
      .as[(Long, Long, Long, Long)].collect()
    val (linTot, ushTot, ft, lt) =
      got.foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), r) =>
        (a + r._1, b + r._2, c + r._3, d + r._4) }
    val nUsers = journeys.length.toLong
    // each user contributes 1e6 ppm minus a sub-J integer-div remainder
    val linLoss = journeys.map { case (_, j) => 1000000L - (1000000L / j) * j }.sum
    assert(linTot == nUsers * 1000000L - linLoss,
      s"linear ppm $linTot != ${nUsers * 1000000L - linLoss}")
    val ushLoss = journeys.map { case (_, j) =>
      if (j <= 2) 0L else 200000L - (200000L / (j - 2)) * (j - 2) }.sum
    assert(ushTot == nUsers * 1000000L - ushLoss,
      s"ushape ppm $ushTot != ${nUsers * 1000000L - ushLoss}")
    // exactly one first and one last touch per converting journey
    assert(ft == nUsers && lt == nUsers)
  }

  test("media_phash_clusters is a consistent partition: one row per image, keepers = clusters, sizes add up") {
    import spark.implicits._
    val cl = graft.multimodal.Media.phashClusters(spark, sf0001)
      .localCheckpoint()
    val nImages = graft.multimodal.Media.phashQuery(spark, sf0001).count()
    assert(cl.count() == nImages)
    assert(cl.select($"doc_id").distinct().count() == nImages)
    val nClusters = cl.select($"cluster_id").distinct().count()
    assert(cl.filter($"is_keeper").count() == nClusters,
      "exactly one keeper per cluster")
    val sizesOk = cl.groupBy($"cluster_id", $"cluster_size")
      .agg(count(lit(1)).as("actual"))
      .filter($"actual" =!= $"cluster_size").count()
    assert(sizesOk == 0, "cluster_size must equal the member count")
    assert(cl.filter($"cluster_size" > 1).count() > 0,
      "the fixture's similarity structure must produce multi-image clusters")
  }
}
