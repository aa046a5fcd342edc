package graft.llm

import graft.SparkSpec

/** embed_triplets + corpus_quality_lpm: the miner must agree with a
  * local brute-force replay inside every cell, and the closed-form OLS
  * must satisfy the normal equations it claims to solve. */
class TripletsLpmSpec extends SparkSpec {

  test("triplets match an in-cell brute-force replay with the same quantized dot") {
    import spark.implicits._
    val got = Similarity.triplets(spark, sf0001)
      .as[(Long, Long, Long, Double, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap

    val cells = Similarity.autoKAssign(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val vecs = graft.Tables(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0L; var i = 0
      while (i < a.length) {
        s += math.floor(a(i).toDouble * b(i).toDouble * 1e14 + 0.5).toLong
        i += 1
      }
      s.toDouble / 1e14
    }
    val byCell = vecs.groupBy { case (id, _, _) => cells(id) }
    var checked = 0
    byCell.values.foreach { members =>
      members.foreach { case (v1, l1, e1) =>
        val n1 = dot(e1, e1)
        def best(pred: Int => Boolean): Option[(Long, Double)] =
          members.iterator.filter { case (v2, l2, _) => v2 != v1 && pred(l2) }
            .map { case (v2, l2, e2) =>
              (v2, dot(e1, e2) / math.sqrt(n1 * dot(e2, e2)))
            }.toSeq.sortBy { case (v2, c) => (-c, v2) }.headOption
        (best(_ == l1), best(_ != l1)) match {
          case (Some((p, cp)), Some((n, cn))) =>
            val (_, gp, gn, gcp, gcn, gm, gs) = got(v1)
            assert(gp == p && gn == n, s"anchor $v1 pair choice")
            assert(gcp == cp && gcn == cn, s"anchor $v1 cosines")
            assert(gm == cp - cn && gs == (if (cp - cn >= 0.05) 1 else 0))
            checked += 1
          case _ => assert(!got.contains(v1), s"anchor $v1 should drop")
        }
      }
    }
    assert(checked == got.size && checked > 100)
  }

  test("LPM coefficients satisfy the normal equations; confusion matrix closes") {
    import spark.implicits._
    val Seq((n, nf, b0, b1, b2, tp, fp, tn, fn, acc)) =
      Curate.qualityLpm(spark, sf0001)
        .as[(Long, Long, Double, Double, Double, Long, Long, Long, Long,
          Double)].collect().toSeq
    assert(tp + fp + tn + fn == n)
    assert(tp + fn == nf, "positives must partition into tp + fn")
    assert(acc == (tp + tn).toDouble / n)

    // exact-rational reference solve: BigInt moments -> BigInt Cramer
    // determinants (the query's doubles approximate exactly these)
    val flagged = Dedup.candidatePairs(spark, sf0001)
      .selectExpr("d1 AS doc_id").union(
        Dedup.candidatePairs(spark, sf0001).selectExpr("d2 AS doc_id"))
      .distinct().as[Long].collect().toSet
    val feats = graft.Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "n_chars",
        """(10000 * size(array_distinct(split(text, ' '))))
           div size(split(text, ' '))""")
      .as[(Long, Long, Long)].collect()
    assert(flagged.nonEmpty && feats.length == n)
    val rows = feats.map { case (id, x1, x2) =>
      (BigInt(1), BigInt(x1), BigInt(x2), BigInt(if (flagged(id)) 1 else 0))
    }
    def s(f: ((BigInt, BigInt, BigInt, BigInt)) => BigInt): BigInt =
      rows.map(f).sum
    val (sn, s1, s2) = (s(_._1), s(_._2), s(_._3))
    val (s11, s12, s22) = (s(r => r._2 * r._2), s(r => r._2 * r._3),
      s(r => r._3 * r._3))
    val (sy, s1y, s2y) = (s(_._4), s(r => r._2 * r._4), s(r => r._3 * r._4))
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val mX = Array(Array(sn, s1, s2), Array(s1, s11, s12), Array(s2, s12, s22))
    val rhs = Array(sy, s1y, s2y)
    val dd = det3(mX)
    assert(dd != BigInt(0))
    val exact = (0 to 2).map { j =>
      val mj = mX.map(_.clone)
      (0 to 2).foreach(i => mj(i)(j) = rhs(i))
      BigDecimal(det3(mj)) / BigDecimal(dd)
    }
    Seq(b0, b1, b2).zip(exact).zipWithIndex.foreach { case ((b, e), i) =>
      assert((BigDecimal(b) - e).abs <= e.abs * 1e-6,
        s"b$i=$b vs exact $e (normal-equation conditioning bound)")
    }
  }
}
