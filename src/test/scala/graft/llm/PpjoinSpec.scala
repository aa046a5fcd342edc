package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-filtering completeness check: the PPJoin-family theorem says
  * the rare-first prefix join can NEVER miss a pair with Jaccard >= t.
  * The DuckDB oracle mirrors the same algorithm, so this spec provides
  * the INDEPENDENT check: a brute-force all-pairs exact Jaccard over
  * the sf0.001 corpus must produce exactly the pair set (and values)
  * that [[Dedup.ppjoin]] reports — completeness AND soundness, against
  * an implementation that shares no candidate-generation logic. */
class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-filtered join equals brute-force all-pairs at t = 0.9") {
    val shingles = spark.read
      .parquet(s"$sf0001/documents.parquet")
      .withColumn("tokens", split($"text", " "))
      .filter(size($"tokens") >= 3)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(tokens) - 3),
          |          i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))""".stripMargin))
        .as("sh"))
      .distinct()
    val n = shingles.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // brute force: the full doc x doc intersection join, no prefixes
    val inter = shingles.as("a")
      .join(shingles.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("inter"))
    val brute = inter
      .join(n.select($"doc_id".as("d1"), $"n".as("n1")), "d1")
      .join(n.select($"doc_id".as("d2"), $"n".as("n2")), "d2")
      .withColumn("uni", $"n1" + $"n2" - $"inter")
      .filter($"inter" * 10 >= $"uni" * 9)
      .select($"d1", $"d2", $"inter", $"uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val pp = Dedup.ppjoin(spark, sf0001)
      .select($"d1", $"d2", $"inter", $"uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(pp == brute,
      s"missed=${(brute -- pp).take(5)} extra=${(pp -- brute).take(5)}")
    assert(pp.nonEmpty, "fixture should contain near-identical pairs")
  }
}
