package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the mixture sampler and the repetition scorer that the
  * oracle hash-compare doesn't state explicitly. */
class MixRepSpec extends SparkSpec {
  import spark.implicits._

  test("sample_mix: keep decision is a pure function of doc_id (repartition-invariant)") {
    val once = TextStats.sampleMix(spark, sf0001).collect().toSeq
    val again = TextStats.sampleMix(
      spark, sf0001).collect().toSeq
    assert(once == again)
    // realized rate tracks the target within binomial noise on a
    // 70+-doc stratum (fixture-deterministic; bound is regen-tolerant)
    once.foreach { r =>
      val (target, total, kept) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      val realized = kept.toDouble / total
      assert(math.abs(realized - target) < 0.2,
        s"${r.getString(0)}: realized $realized vs target $target")
    }
  }

  test("sample_mix salt decorrelates from the train/val/test split hash") {
    // same doc, two different salted hashes: if they were the same
    // stream, every kept en-doc at rate 0.5 would be exactly the
    // bucket<50 half of corpusSplit's mod-100 stream
    val u = graft.Tables(spark, sf0001, "documents")
      .selectExpr(
        "cast(conv(substr(md5(cast(concat('mix:', cast(doc_id AS STRING)) as binary)), 1, 8), 16, 10) as bigint) % 100 AS mix_b",
        "cast(conv(substr(md5(cast(cast(doc_id AS STRING) as binary)), 1, 8), 16, 10) as bigint) % 100 AS split_b")
      .filter($"mix_b" === $"split_b").count()
    // expected collisions ~ n/100; equality of the full streams would be n
    assert(u < 50, s"salted hashes collide on $u of 500 docs")
  }

  test("rep_ngrams: bounds and construction") {
    val rows = TextStats.repNgrams(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nW, nUW, nB, nUB) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(nUW >= 1 && nUW <= nW)
      assert(nB == math.max(nW - 1, 0))
      assert(nUB >= (if (nB > 0) 1 else 0) && nUB <= nB)
      val dw = r.getDouble(6); val db = r.getDouble(7)
      assert(dw >= 0.0 && dw < 1.0 && db >= 0.0 && db < 1.0)
      assert(r.getBoolean(8) == (db > 0.2))
    }
  }

  test("pii_scrub: multiple hits per line, clean text untouched") {
    val out = Seq(
      (1L, "write to a.b@x.io or c_d@y.org call +44 20 7946 0958 now"),
      (2L, "no contact details here at all")
    ).toDF("doc_id", "raw")
      .select($"doc_id",
        regexp_replace(regexp_replace($"raw",
          lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"), lit("<EMAIL>")),
          lit("\\+?[0-9][0-9 .-]{6,}[0-9]"), lit("<PHONE>")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> or <EMAIL> call <PHONE> now")
    assert(out(2L) == "no contact details here at all")
  }

  test("rep_ngrams flags a synthetic repeated-template doc, passes varied prose") {
    val df = Seq(
      (1L, "en", Seq.fill(30)("buy now click here").mkString(" ")),
      (2L, "en", (1 to 120).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    df.createOrReplaceTempView("rep_probe")
    val out = spark.sql(
      """SELECT doc_id,
        |  CASE WHEN size(split(text, ' ')) >= 2 THEN
        |    size(array_distinct(transform(sequence(0, size(split(text, ' ')) - 2),
        |         i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1]))))
        |  ELSE 0 END AS n_uniq_bigrams,
        |  size(split(text, ' ')) - 1 AS n_bigrams
        |FROM rep_probe""".stripMargin)
      .collect().map(r => r.getLong(0) -> (1.0 - r.getInt(1).toDouble / r.getInt(2))).toMap
    assert(out(1L) > 0.9, "template spam must score as repetitive")
    assert(out(2L) == 0.0, "all-distinct prose has zero duplicate bigrams")
  }
}
