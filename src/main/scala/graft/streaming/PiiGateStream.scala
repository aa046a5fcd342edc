package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII-redaction gate — the ingestion-time twin of
  * `llm/Curate.piiScan`/`piiRedact`: every incoming document is scanned
  * for the five PII detector patterns and rewritten with typed
  * placeholders BEFORE it can land in the training corpus, so raw PII
  * never persists past the ingest hop (the C4/Pile release-audit pass,
  * moved to where it actually has to run in production: the stream).
  *
  * Like [[DecontamStream]], the gate is MAP-ONLY — the detectors and
  * the redaction are pure column expressions (`regexp_extract_all` /
  * `regexp_replace` chains over foldable pattern literals), so there is
  * no explode, no aggregation, no watermark, zero state stores, plain
  * append mode, and the streamed output is bit-identical to applying
  * the same expressions in batch (asserted in PiiGateStreamSpec). The
  * per-source audit totals `piiScan` reports are then one ordinary
  * downstream aggregation over the gate's counters.
  *
  * Scale posture: one projection per document at ingest parallelism;
  * the patterns ride the plan as literals (nothing broadcast, nothing
  * versioned); counters are small ints per row. At 100 TB the gate adds
  * a constant per-row regex cost to a scan the pipeline pays anyway.
  */
object PiiGateStream {

  /** The gate: per-doc detector counts, the all-clear verdict, and the
    * redacted text (placeholders applied in the same specificity order
    * the scan counts in). Works identically on a batch or streaming
    * frame with (doc_id, text) columns — the spec asserts the two are
    * bit-equal. */
  def gate(docs: DataFrame): DataFrame = {
    val counts = graft.llm.Curate.piiPatterns.map { case (n, p) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0)))
        .cast("long").as(s"n_$n")
    }
    val total = graft.llm.Curate.piiPatterns
      .map { case (n, _) => col(s"n_$n") }.reduce(_ + _)
    docs
      .select(col("doc_id") +: counts :+ col("text"): _*)
      .withColumn("verdict", when(total > 0, "pii").otherwise("clean"))
      .withColumn("redacted_text",
        graft.llm.Curate.piiRedact(col("text")))
      .drop("text")
  }
}
