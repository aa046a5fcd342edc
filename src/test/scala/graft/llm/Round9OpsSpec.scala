package graft.llm

import graft.SparkSpec

/** Local proofs for the round-9 operators the DuckDB oracle can't
  * state: Lloyd monotonicity of the learned PQ codebooks, the
  * surprisal sign/bucket contracts of the bigram-LM scorer, and the
  * tokenizer-comparison accounting identity. */
class Round9OpsSpec extends SparkSpec {

  test("pq learned: one Lloyd step never increases per-subspace distortion") {
    val rows = Similarity.pqLearned(spark, sf0001).collect()
    assert(rows.length == 4, "one row per subspace")
    rows.foreach { r =>
      val init = r.getAs[Number]("sum_d2_init").doubleValue
      val learned = r.getAs[Number]("sum_d2_learned").doubleValue
      // exact means would guarantee <=; the 1e-12 centroid quantization
      // can add at most a hair — allow 0.01% slack
      assert(learned <= init * 1.0001,
        s"subspace ${r.get(0)}: Lloyd step regressed $init -> $learned")
      assert(init > 0, "fixture distortion must be nonzero")
    }
  }

  test("lm surprisal: non-negative, bucket order follows bits, terciles balanced") {
    val rows = Curate.lmSurprisal(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nb, sq, bits, _) =>
      assert(sq >= 0, s"doc $doc negative surprisal")
      assert(nb >= 1)
      assert(bits >= 0)
    }
    val byBucket = rows.groupBy(_._5).view.mapValues(_.map(_._4)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // every head doc scores <= every tail doc
    assert(byBucket("head").max <= byBucket("tail").min + 1e-12)
    // ntile balance: sizes differ by at most 1
    val sizes = byBucket.values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"unbalanced terciles: $byBucket")
  }

  test("tokenizer compare: fertility >= 1 and chars-per-token consistent") {
    val rows = Curate.tokenizerCompare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val bpe = r.getAs[Long]("bpe_tokens")
      val uni = r.getAs[Long]("uni_tokens")
      assert(bpe >= nWords, "a word is at least one BPE token")
      assert(uni >= nWords, "a word is at least one unigram token")
      val winner = r.getAs[String]("winner")
      if (bpe < uni) assert(winner == "bpe")
      else if (uni < bpe) assert(winner == "unigram")
      else assert(winner == "tie")
    }
  }
}
