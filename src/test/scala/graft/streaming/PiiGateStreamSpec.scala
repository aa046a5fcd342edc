package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Ingestion-time PII gate: map-only scan + redaction with zero
  * streaming state; streamed output bit-identical to the batch
  * expressions; redaction drives every detector back to zero. */
class PiiGateStreamSpec extends SparkSpec {

  /** A seeded-dirty frame: every detector pattern trips at least once,
    * mixed with clean rows (the harness corpus itself is PII-clean, so
    * the detection direction needs planted positives). */
  private def dirty = {
    import spark.implicits._
    Seq(
      (1L, "contact bob.smith+spam@example-corp.io today"),
      (2L, "ssn 123-45-6789 leaked beside ip 10.0.255.1"),
      (3L, "call +1 555 867 5309 re account 00012345678"),
      (4L, "a perfectly clean document about spark plans"),
      (5L, "two emails a@b.co c@d.org and 192.168.0.1"))
      .toDF("doc_id", "text")
  }

  test("every detector trips on the seeded frame and redaction zeroes them all") {
    import spark.implicits._
    val gated = PiiGateStream.gate(dirty)
    val sums = gated.agg(
      sum($"n_email"), sum($"n_ssn"), sum($"n_ipv4"),
      sum($"n_phone"), sum($"n_digit_run"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(sums._1 >= 3, s"email detector: $sums")
    assert(sums._2 >= 1, s"ssn detector: $sums")
    assert(sums._3 >= 2, s"ipv4 detector: $sums")
    assert(sums._4 >= 1, s"phone detector: $sums")
    assert(sums._5 >= 1, s"digit-run detector: $sums")
    assert(gated.filter($"doc_id" === 4L && $"verdict" === "clean").count() == 1)
    // re-scan the redacted text: every counter must be zero
    val rescan = PiiGateStream.gate(
      gated.select($"doc_id", $"redacted_text".as("text")))
    assert(rescan.filter($"verdict" === "pii").count() == 0,
      "redaction left live PII behind")
  }

  test("the gate streams in append mode with zero state stores, bit-equal to batch") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("pii_in").toFile.getAbsolutePath
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text")
      .unionByName(dirty)
    docs.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val q = PiiGateStream.gate(stream)
      .writeStream.format("memory").queryName("pii_gate")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty,
      "gate must hold zero streaming state")

    val streamed = spark.table("pii_gate")
      .select($"doc_id", $"n_email", $"n_digit_run", $"verdict",
        $"redacted_text")
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val batch = PiiGateStream.gate(spark.read.parquet(inDir))
      .select($"doc_id", $"n_email", $"n_digit_run", $"verdict",
        $"redacted_text")
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(streamed == batch, "streamed gate diverges from batch")
    assert(streamed.nonEmpty)
    assert(streamed.values.exists(_._3 == "pii"),
      "the seeded rows must flow through the stream")
  }
}
