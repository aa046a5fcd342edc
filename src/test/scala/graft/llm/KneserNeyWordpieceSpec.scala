package graft.llm

import graft.SparkSpec

/** Kneser–Ney smoothing laws and WordPiece greedy-segmentation laws
  * replayed against scalar reference implementations. */
class KneserNeyWordpieceSpec extends SparkSpec {

  test("kneser-ney: probabilities are the exact m/u rational; counts replay") {
    import spark.implicits._
    val got = Curate.kneserNey(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got.nonEmpty && got.size <= 100)

    // scalar bigram model over the same corpus
    val docs = graft.Tables(spark, sf0001, "documents")
      .select("text").as[String].collect()
    val bigrams = docs.flatMap { t =>
      val w = t.split(" ", -1)
      if (w.length >= 2) w.sliding(2).map(p => (p(0), p(1))) else Iterator.empty
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val fanout = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val fanin = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b = c12.size.toLong

    got.foreach { case (w1, w2, g12, g1, fo, fi, gb, p) =>
      assert(g12 == c12((w1, w2)) && g1 == c1(w1))
      assert(fo == fanout(w1) && fi == fanin(w2) && gb == b)
      val expected = (math.max(4 * g12 - 3, 0) * b + 3 * fo * fi).toDouble /
        (4 * g1 * b).toDouble
      assert(p == expected)
      assert(p > 0.0 && p <= 1.0 + 1e-12)
    }
    // top-100 really is by bigram count
    assert(got.map(_._3).sliding(2).forall(s => s.head >= s.last))
  }

  test("tokenizer trio: per-language totals agree with the pairwise compare and the wordpiece apply") {
    import spark.implicits._
    val trio = Curate.tokenizerTrio(spark, sf0001)
      .select("lang", "n_words", "bpe_tokens", "uni_tokens", "wp_tokens",
        "winner")
      .as[(String, Long, Long, Long, Long, String)].collect().toSeq
    assert(trio.nonEmpty)
    val pair = Curate.tokenizerCompare(spark, sf0001)
      .select("lang", "n_words", "bpe_tokens", "uni_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    trio.foreach { case (lang, nw, bpe, uni, wp, winner) =>
      assert(pair(lang) == ((nw, bpe, uni))) // legs agree with the 2-way op
      assert(wp > 0 && wp >= nw) // at least one piece per word
      val min = Seq(bpe, uni, wp).min
      val expect = if (bpe == min) "bpe" else if (uni == min) "unigram"
        else "wordpiece"
      assert(winner == expect)
    }
  }

  test("wordpiece: greedy longest-match segment counts replay per document") {
    import spark.implicits._
    val got: Map[Long, (Long, Long, Double)] =
      Curate.wordpieceTokenize(spark, sf0001)
        .as[(Long, Long, Long, Double)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got.nonEmpty)

    // rebuild the deterministic vocab exactly as the operator does
    val words = graft.Tables(spark, sf0001, "documents")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(w => w.nonEmpty && w.length <= 16)
    val wc = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def topBy(m: Map[String, Long]) =
      m.toSeq.sortBy { case (p, c) => (-c, p) }.take(20).map(_._1)
    val initMulti = topBy(
      wc.toSeq.flatMap { case (w, c) =>
        (2 to 4).filter(_ <= w.length).map(l => w.substring(0, l) -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
    val contMulti = topBy(
      wc.toSeq.flatMap { case (w, c) =>
        for (l <- 2 to 4; i <- 1 until w.length - l + 1)
          yield ("##" + w.substring(i, i + l)) -> c
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
    val initSingle = wc.keys.map(_.substring(0, 1)).toSet
    val contSingle = wc.keys.filter(_.length >= 2)
      .flatMap(w => w.substring(1).map(c => "##" + c)).toSet
    val vocab: Set[String] =
      initMulti.toSet ++ contMulti.toSet ++ initSingle ++ contSingle

    def encode(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val m = (4 to 1 by -1).find { l =>
          pos + l <= w.length && {
            val piece = w.substring(pos, pos + l)
            vocab.contains(if (pos == 0) piece else "##" + piece)
          }
        }.get // singles guarantee coverage
        pos += m; n += 1
      }
      n
    }

    val perDoc = graft.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    perDoc.foreach { case (docId, text) =>
      val ws = text.split(" ", -1).filter(w => w.nonEmpty && w.length <= 16)
      if (ws.nonEmpty) {
        val (nTok, nCh, cpt) = got(docId)
        assert(nTok == ws.map(encode).sum)
        assert(nCh == ws.map(_.length.toLong).sum)
        assert(cpt == nCh.toDouble / nTok.toDouble)
        assert(nTok >= ws.length) // at least one piece per word
      }
    }
  }

}
