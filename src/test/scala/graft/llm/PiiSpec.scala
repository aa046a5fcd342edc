package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The detection direction of text_pii_scan (the clean fixture corpus
  * proves only the zero-counting parity): every pattern trips on a
  * seeded-dirty frame, redaction drives every count back to zero, and
  * redaction is idempotent. */
class PiiSpec extends SparkSpec {

  private val dirty = Seq(
    ("s1", "contact me at alice.smith+spam@example-mail.co.uk today"),
    ("s1", "my ssn is 123-45-6789 and my backup is 987-65-4321"),
    ("s2", "server at 192.168.101.7 and 10.0.0.255 went down"),
    ("s2", "call +1 555 867 5309 or +44 207 946 0958 now"),
    ("s3", "order 123456789012 card 4111111122223333"),
    ("s3", "perfectly clean text with no identifiers at all"))

  test("each pattern trips on a seeded-dirty frame; clean rows stay clean") {
    import spark.implicits._
    val df = dirty.toDF("source", "text")
    val out = Curate.piiScanFrame(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s1").getAs[Long]("n_email") == 1L)
    assert(out("s1").getAs[Long]("n_ssn") == 2L)
    assert(out("s2").getAs[Long]("n_ipv4") == 2L)
    assert(out("s2").getAs[Long]("n_phone") == 2L)
    assert(out("s3").getAs[Long]("n_digit_run") == 2L)
    assert(out("s1").getAs[Long]("n_docs_with_pii") == 2L)
    assert(out("s3").getAs[Long]("n_docs_with_pii") == 1L,
      "the clean s3 row must not count")
  }

  test("redaction zeroes every detector and is idempotent") {
    import spark.implicits._
    val df = dirty.toDF("source", "text")
    val once = df.select($"source", Curate.piiRedact($"text").as("text"))
    val rescan = Curate.piiScanFrame(once).collect()
    rescan.foreach { r =>
      Seq("n_email", "n_ssn", "n_ipv4", "n_phone", "n_digit_run",
        "n_docs_with_pii").foreach { c =>
        assert(r.getAs[Long](c) == 0L, s"${r.getString(0)}.$c after redact")
      }
    }
    val twice = once.select($"source", Curate.piiRedact($"text").as("text"))
    assert(once.collect().toSeq == twice.collect().toSeq,
      "redaction must be idempotent")
    // placeholders actually landed (redaction isn't deletion)
    assert(once.filter($"text".contains("<ssn>")).count() == 1)
    assert(once.filter($"text".contains("<email>")).count() == 1)
  }
}
