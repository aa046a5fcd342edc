package graft.llm

import graft.SparkSpec

/** BM25 scoring: plan-shape gates (the 100 TB posture) and ranking
  * sanity the oracle hash doesn't state. */
class SearchSpec extends SparkSpec {

  private lazy val df = Search.bm25(spark, sf0001)
  private lazy val plan = df.queryExecution.executedPlan.toString

  test("top-k compiles to TakeOrderedAndProject, stats join is broadcast") {
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("scores are positive, rows term-matched, order strictly descending by (score, doc_id)") {
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getDouble(6)))
    assert(rows.length == 20)
    rows.foreach { case (_, dl, tf0, tf1, tf2, score) =>
      assert(tf0 + tf1 + tf2 > 0, "only matching docs are scored")
      assert(score > 0.0 && dl > 0)
    }
    val keys = rows.map { case (id, _, _, _, _, s) => (-s, id) }
    assert(keys.sameElements(keys.sorted), "descending score, doc_id tiebreak")
  }

  test("word_pmi: top collocations are positively associated, counts consistent") {
    val pmi = Search.wordPmi(spark, sf0001)
    assert(pmi.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = pmi.collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (cab, ca, cb, lift) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cab >= 3 && cab <= math.min(ca, cb),
        "a bigram can't outnumber either of its words")
      assert(lift > 1.0, "top-30 collocations must beat independence")
    }
  }

  test("a doc with more occurrences of a rare term outranks fewer (fixed dl)") {
    import spark.implicits._
    // synthetic: same length, same df environment, tf 3 vs 1
    Seq(
      (1L, "en", "query query query pad pad pad pad pad"),
      (2L, "en", "query pad pad pad pad pad pad pad"),
      (3L, "en", "pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "lang", "text").createOrReplaceTempView("documents_bm25_probe")
    val scored = spark.sql(
      """SELECT doc_id,
        |  size(filter(split(text, ' '), x -> x = 'query')) AS tf,
        |  size(split(text, ' ')) AS dl
        |FROM documents_bm25_probe""".stripMargin)
      .selectExpr("doc_id",
        "cast((tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 8.0)) as double) AS sat")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L) && scored(2L) > scored(3L))
    // and saturation: tf 3 is NOT 3x the tf-1 score (k1 dampening)
    assert(scored(1L) < 3 * scored(2L))
  }
}
