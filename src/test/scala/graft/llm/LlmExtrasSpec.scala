package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the round-2 LLM-curation additions that the DuckDB
  * oracle can't express: SRP-LSH precision/recall vs the brute-force
  * ground truth, TF-IDF ranking coherence, and corpus-prep
  * conservation bounds. */
class LlmExtrasSpec extends SparkSpec {

  private def bruteForcePairs = {
    import spark.implicits._
    graft.functions.DecimalDot.register(spark)
    val emb = graft.Tables(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "embedding",
        "decimal_dot(embedding, embedding) AS nrm")
    val a = emb.select($"vec_id".as("v1"), $"embedding".as("e1"), $"nrm".as("n1"))
    val b = emb.select($"vec_id".as("v2"), $"embedding".as("e2"), $"nrm".as("n2"))
    a.join(b, $"v1" < $"v2")
      .selectExpr("v1", "v2", "(decimal_dot(e1, e2) / sqrt(n1 * n2)) AS cosine")
      .filter($"cosine" > 0.35)
  }

  test("srp pairs are a subset of brute-force pairs (precision 1)") {
    val srp = Similarity.srpNeardup(spark, sf0001)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteForcePairs
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(srp.nonEmpty)
    assert(srp.subsetOf(brute),
      s"SRP emitted ${srp.diff(brute).size} pairs not in the exact set")
  }

  test("srp recall vs brute force is above the banding floor") {
    // 8 planes / two 4-bit bands: P(pair at cosine c shares a band) =
    // 1 - (1 - p^4)^2 with p = 1 - acos(c)/pi; at the 0.35 cut that is
    // ~0.26 and rises steeply with c. Input is fixed, SRP is
    // deterministic, so observed recall is a constant of the fixture;
    // 0.15 is a conservative floor (regen-proof), not the expectation.
    val srp = Similarity.srpNeardup(spark, sf0001)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteForcePairs
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = srp.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.15, f"recall $recall%.3f below floor (|brute|=${brute.size})")
  }

  test("tfidf ranks are contiguous per doc with non-increasing scores") {
    val rows = TextStats.tfidf(spark, sf0001)
      .select("doc_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"doc $doc ranks not contiguous")
      assert(sorted.length <= 3, s"doc $doc has ${sorted.length} ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3,
          s"doc $doc scores increase from rank ${a._2} to ${b._2}")
        case _ =>
      }
    }
  }

  test("corpus_prep yields are bounded by the raw corpus") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
    val rawDocs = docs.count()
    val rawWs = docs.selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    val prep = TextStats.corpusPrep(spark, sf0001).collect()
    assert(prep.nonEmpty)
    val kept = prep.map(_.getLong(1)).sum
    val ws = prep.map(_.getLong(2)).sum
    assert(kept > 0 && kept <= rawDocs, s"kept=$kept raw=$rawDocs")
    assert(ws > 0 && ws <= rawWs, s"ws=$ws raw=$rawWs")
  }

  test("fluency: template text outscores shuffled text under the corpus LM") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fluency").toString
    val pattern = Seq.fill(8)("a b c d").mkString(" ")   // bigrams repeat
    val shuffled = "d b a c " * 8                        // same words, broken order
    ((0L until 10L).map(i => (i, pattern)) :+ (10L, shuffled.trim))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = TextStats.fluency(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap
    val (knownP, fluP) = rows(0L)
    val (_, fluS) = rows(10L)
    assert(knownP > 0 && fluP > 0.5, s"pattern doc should be fluent: $fluP")
    // the scrambled doc's transitions carry a small share of each
    // left-word's mass (10 pattern docs dominate the model), so its
    // average transition probability must sit far below the pattern's
    assert(fluS < fluP - 0.3, s"shuffled fluency=$fluS vs pattern=$fluP")
  }

  test("simhash banding finds exactly the brute-force hamming<=1 pairs") {
    val fp = Dedup.simhashCore(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("simhash16"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (d1, h1) <- fp; (d2, h2) <- fp if d1 < d2
      if java.lang.Long.bitCount(h1 ^ h2) <= 1
    } yield (d1, d2)).toSet
    val banded = Dedup.simhashPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, "pigeonhole banding must be exact-complete")
    assert(brute.nonEmpty, "fixture should contain close fingerprints")
  }

  test("chunking covers every token: contiguous ids, last chunk ends at n") {
    import spark.implicits._
    val chunks = TextStats.chunk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nToks = graft.Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val ids = cs.map(_._2).sorted
      assert(ids.toSeq == (0 until cs.length), s"doc $doc ids not contiguous")
      // stride 25: chunk i starts at i*25; its window must reach the
      // document end on the LAST chunk exactly
      val n = nToks(doc)
      val endOfLast = cs.map(c => c._2 * 25 + c._3).max
      assert(endOfLast == n, s"doc $doc: last chunk ends $endOfLast of $n")
      // every non-final chunk is the full 50-token window
      cs.filter(_._2 < ids.last).foreach(c => assert(c._3 == 50))
    }
  }

  test("PQ encoding: one code per (vector, subspace), non-negative d2") {
    import spark.implicits._
    val rows = Similarity.pqCode(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Number](2).longValue(), r.getDouble(3)))
    val nVecs = graft.Tables(spark, sf0001, "embeddings").count()
    assert(rows.length == nVecs * 4, "M=4 sub-codes per vector")
    rows.groupBy(_._1).foreach { case (_, subs) =>
      assert(subs.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3))
    }
    // exact-arithmetic L2^2 can round to a hair below zero only if the
    // slice equals the centroid slice; otherwise strictly positive
    assert(rows.forall(_._4 >= -1e-12))
    // the codebook is actually used: more than one distinct code label
    assert(rows.map(_._3).distinct.length > 1)
  }
}
