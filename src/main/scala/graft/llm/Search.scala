package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Term-based relevance scoring for corpus curation: BM25 top-k over
  * `documents` for a fixed query-term set — the retrieval primitive a
  * training-data pipeline uses to pull topic-relevant documents (or to
  * score proximity to a seed set) without an embedding model.
  *
  * Scoring contract: classic BM25 (k1=1.2, b=0.75) with the idf factor
  * in ODDS form, (N - df + 0.5) / (df + 0.5), not its logarithm. Every
  * other engine constant in this repo avoids transcendental functions
  * (see TextStats.tfidf: libm implementations differ in the last ulp
  * across engines, which a hash-compare gate cannot tolerate); the odds
  * form keeps the score a composition of IEEE-exact +,*,/ so Spark and
  * DuckDB agree bit-for-bit. For a single term the ranking is identical
  * to log-idf BM25 (log is monotone); for multi-term sums it is a
  * deliberately defined variant that weights rare terms more sharply.
  *
  * Scale posture: one map pass computes per-doc term frequencies inside
  * array expressions (no explode — the shuffle-free form); the corpus
  * statistics (N, Σdl, per-term df) are ONE aggregated row, broadcast
  * back by the cross join; top-k is TakeOrderedAndProject, never a
  * global sort. At 100 TB: scan-speed map + a 1-row exchange + k rows
  * to the driver.
  */
object Search {

  private val terms = Seq("query", "join", "vector")

  /** Shared Spark/DuckDB SQL fragments — the formula TEXT is identical
    * in both dialects so the expression trees (and thus every IEEE
    * rounding step) match. */
  private def scoreTerm(i: Int): String =
    s"((n_docs - df$i + 0.5) / (df$i + 0.5))" +
      s" * ((tf$i * (1.2 + 1)) / (tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / (total_dl / n_docs))))"

  private val scoreSql: String =
    terms.indices.map(scoreTerm).mkString("(", " + ", ")")

  private val anyMatch: String =
    terms.indices.map(i => s"tf$i").mkString(" + ") + " > 0"

  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"size(filter(tokens, x -> x = '$t')) AS tf$i"
    }
    val toks = Tables(spark, dir, "documents")
      .withColumn("tokens", split($"text", " "))
      .selectExpr(Seq("doc_id", "lang", "size(tokens) AS dl") ++ tfCols: _*)
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum($"dl").cast("double").as("total_dl") +:
        terms.indices.map(i =>
          sum(($"tf$i" > 0).cast("int")).cast("double").as(s"df$i"))): _*)
    toks.crossJoin(broadcast(stats))
      .filter(expr(anyMatch))
      .selectExpr(
        Seq("doc_id", "lang", "dl") ++ terms.indices.map(i => s"tf$i") :+
          s"$scoreSql AS score": _*)
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
  }

  val bm25Sql: String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS INTEGER) AS tf$i"
    }.mkString(",\n       |    ")
    val dfCols = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
      .mkString(",\n       |    ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS INTEGER) AS dl,
       |    $tfCols
       |  FROM documents
       |),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) AS total_dl,
       |    $dfCols
       |  FROM toks
       |)
       |SELECT doc_id, lang, dl, ${terms.indices.map(i => s"tf$i").mkString(", ")},
       |  $scoreSql AS score
       |FROM toks, st
       |WHERE $anyMatch
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> bm25)

  val oracles: Map[String, String] = Map(
    "text_bm25" -> bm25Sql)
}
