package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** corpus_pack / corpus_split / embed_kmeans_update invariants beyond
  * the DuckDB oracle gate. */
class PackSplitSpec extends SparkSpec {

  test("distributed prefix-sum packing equals the single-window form") {
    import spark.implicits._
    val naive = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", expr("cast(size(split(text, ' ')) as bigint)").as("n_tok"))
      .withColumn("cum", sum($"n_tok").over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", (($"cum" - $"n_tok") / 2048L).cast("bigint"))
      .groupBy($"bin").agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = TextStats.corpusPack(spark, sf0001)
      .select("bin", "n_docs", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && dist == naive)
  }

  test("pack bins are gapless and close past their boundary") {
    val rows = TextStats.corpusPack(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val bins = rows.map(_._1)
    assert(bins.toSeq == (bins.min to bins.max).toSeq, "bins must be contiguous")
    // A bin's own token sum may legally be under budget (a doc straddling
    // IN from the previous bin eats its head), but the tape position at
    // the end of every non-last bin must have crossed that bin's upper
    // boundary — otherwise the next doc would still belong to this bin.
    var end = 0L
    rows.dropRight(1).foreach { case (b, _, tok) =>
      end += tok
      assert(end >= 2048L * (b + 1),
        s"bin $b ends at tape offset $end, before boundary ${2048L * (b + 1)}")
    }
  }

  test("hash split is stable and ~80/10/10") {
    import spark.implicits._
    val rows = TextStats.corpusSplit(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet), bySplit.toString)
    assert(bySplit("train").toDouble / total > 0.6, bySplit.toString)
    // determinism: a second evaluation is bit-identical (no RNG anywhere)
    val again = TextStats.corpusSplit(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("kmeans update conserves members and shrinks within-cluster fit") {
    import spark.implicits._
    val total = graft.Tables(spark, sf0001, "embeddings").count()
    val rows = Similarity.kmeansUpdate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == total, "every vector assigned exactly once")
    rows.foreach { r =>
      val shift = r.getDouble(2)
      assert(shift >= 0.0, s"negative squared shift: $r")
    }
  }
}
