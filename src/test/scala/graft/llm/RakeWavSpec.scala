package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytical invariants of the RAKE keyphrases and the audio decimation
  * that the value-level oracle doesn't state. */
class RakeWavSpec extends SparkSpec {

  test("rake: top phrase is stopword-free and a contiguous run of the doc") {
    import spark.implicits._
    val stop = Set("the", "a", "value", "data")
    val rows = TextStats.keywordRake(spark, sf0001)
      .join(graft.Tables(spark, sf0001, "documents").select($"doc_id", $"text"),
        "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phrase = r.getString(1)
      val score = r.getDouble(2)
      assert(phrase.nonEmpty && score > 0.0)
      assert(phrase.split(" ").forall(w => !stop(w)),
        s"stopword leaked into keyphrase: '$phrase'")
      assert((" " + r.getString(4) + " ").contains(" " + phrase + " ") ||
        r.getString(4).startsWith(phrase + " ") ||
        r.getString(4).endsWith(" " + phrase) || r.getString(4) == phrase,
        s"phrase '$phrase' is not a contiguous run of doc ${r.getLong(0)}")
      assert(r.getLong(3) >= 1) // n_phrases
    }
  }

  test("rake: single-phrase doc scores len^2 / 1 (degree=len for every word)") {
    import spark.implicits._
    // all-distinct no-stopword doc: one phrase of length L; every word has
    // deg = L, freq = 1 → phrase score = L * L
    val df = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
    val tmp = java.nio.file.Files.createTempDirectory("rake").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextStats.keywordRake(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getString(1) == "alpha beta gamma delta")
    assert(math.abs(r.head.getDouble(2) - 16.0) < 1e-9,
      s"expected 4*4=16, got ${r.head.getDouble(2)}")
  }

  test("wav decimation halves length and cannot raise the peak") {
    val full = graft.multimodal.Media.wavDecode(spark, sf0001)
      .collect().map(f => f.doc_id -> f).toMap
    val half = graft.multimodal.Media.wavResampleQuery(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(full.keySet == half.keySet && full.nonEmpty)
    full.foreach { case (id, f) =>
      val h = half(id)
      assert(h.getLong(2) == f.n_samples / 2,
        s"doc $id: decimated length ${h.getLong(2)} != ${f.n_samples / 2}")
      assert(h.getInt(3) <= f.peak + 1, // mean of two samples <= max (+1 floor slack)
        s"doc $id: decimated peak ${h.getInt(3)} above original ${f.peak}")
      assert(h.getInt(1) * 2 == f.sample_rate)
    }
  }
}
