package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Properties of the Curate batch the DuckDB oracle either can't state
  * or that deserve a local proof: the two-stage source cap equals the
  * single-stage rank, tercile ordering is monotone, BPE pairs are
  * well-formed, span coverage is interval-consistent. */
class CurateSpec extends SparkSpec {

  test("source cap: two-stage pre-rank equals the naive single-stage rank") {
    import spark.implicits._
    val twoStage = Curate.sourceCap(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val naive = graft.Tables(spark, sf0001, "documents")
      .withColumn("u",
        expr("cast(conv(substr(md5(cast(concat('cap:', cast(doc_id AS STRING)) as binary)), 1, 8), 16, 10) as bigint)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"u", $"doc_id")))
      .filter($"rk" <= 15)
      .select($"source", $"rk", $"doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(twoStage.nonEmpty)
    assert(twoStage == naive)
  }

  test("source cap: at most 50 per source, ranks contiguous") {
    val rows = Curate.sourceCap(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= 15, s"$src over cap")
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"$src ranks gap")
    }
  }

  test("quality buckets: terciles balanced and monotone in ttr per lang") {
    val rows = Curate.qualityBuckets(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      assert(byBucket.keySet.subsetOf(Set(1, 2, 3)), s"$lang bad bucket ids")
      val sizes = byBucket.values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: $sizes")
      for (hi <- 1 to 2; lo <- (hi + 1) to 3
           if byBucket.contains(hi) && byBucket.contains(lo))
        assert(byBucket(hi).min >= byBucket(lo).max,
          s"$lang bucket $hi has lower ttr than bucket $lo")
    }
  }

  test("bpe pairs: 20 two-char pairs with non-increasing counts") {
    val rows = Curate.bpePairs(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.forall(_._1.length == 2))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"counts not sorted: $a before $b")
    }
  }

  test("dsir weights: target-language docs score above the others") {
    import spark.implicits._
    val w = Curate.dsirWeights(spark, sf0001)
      .join(graft.Tables(spark, sf0001, "documents").select($"doc_id", $"lang"),
        "doc_id")
      .collect().map(r => (r.getString(3), r.getDouble(2)))
    val (en, rest) = w.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enAvg = en.map(_._2).sum / en.length
    val restAvg = rest.map(_._2).sum / rest.length
    assert(enAvg > restAvg,
      f"importance inverted: en=$enAvg%.3f rest=$restAvg%.3f")
    // weights are non-negative and finite
    assert(w.forall { case (_, x) => x >= 0 && !x.isNaN && !x.isInfinite })
  }

  test("span cover: coverage bounded by spans and doc length") {
    val rows = Curate.spanCover(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty, "fixture has no cross-doc duplicate 8-grams")
    rows.foreach { case (doc, nTok, nSpans, nCov, frac) =>
      assert(nSpans >= 1, s"doc $doc emitted with no spans")
      assert(nCov >= 8, s"doc $doc covered < one window")
      assert(nCov <= math.min(nTok.toLong, 8L * nSpans),
        s"doc $doc coverage exceeds disjoint-span bound")
      assert(nCov >= 7 + nSpans,
        s"doc $doc coverage below overlapping-chain floor")
      assert(frac > 0 && frac <= 1.0, s"doc $doc fraction $frac out of range")
    }
  }

  test("max span: equals brute-force longest common token span") {
    import spark.implicits._
    val got = Curate.maxSpan(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup = got.filter(_._2 > 0)
    assert(dup.nonEmpty, "fixture has no cross-doc duplicate span")
    // every reported span is at least one full 8-gram window
    dup.values.foreach(v => assert(v >= 8, s"span $v below window size"))
    // a doc's partner shares the span verbatim, so it is flagged too:
    // brute-force DP over just the flagged docs is exact for them.
    val toks = graft.Tables(spark, sf0001, "documents")
      .filter($"doc_id".isin(dup.keys.toSeq: _*))
      .select($"doc_id", split($"text", " "))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    def lcs(a: Array[String], b: Array[String]): Int = {
      var best = 0
      val prev = new Array[Int](b.length + 1)
      val cur = new Array[Int](b.length + 1)
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1 else 0
          if (cur(j + 1) > best) best = cur(j + 1)
          j += 1
        }
        System.arraycopy(cur, 0, prev, 0, cur.length)
        i += 1
      }
      best
    }
    val ids = toks.keys.toSeq.sorted
    for (d <- ids) {
      val expect = ids.filter(_ != d)
        .map(o => lcs(toks(d), toks(o))).max
      assert(got(d) == expect.toLong,
        s"doc $d: reported ${got(d)} vs brute-force $expect")
    }
  }
}
