package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming conformal anomaly gate — the ingestion-time twin of
  * `star/Inference.eventsConformalGate`: every incoming event's value
  * is checked against the batch-calibrated split-conformal band for
  * its type (mu ± q, the distribution-free interval whose false-alarm
  * rate is ≤ α = 0.1 by the conformal guarantee) BEFORE it lands —
  * the monitoring pattern where the heavy work (training + rank-k
  * calibration) runs batch-side and the stream pays one comparison.
  *
  * Statelessness trick: like [[NeardupStream]]'s static index side,
  * the model is a TABLE — but a tiny one (|event_type| rows), so the
  * stream-static equi-join broadcasts and the gate is effectively
  * MAP-ONLY: no watermark, no aggregation, zero state stores, plain
  * append mode, verdicts bit-identical to the batch expression
  * (asserted in ConformalGateStreamSpec). The quantization (1e-6
  * micro-units, one IEEE round) is the same fixed-point contract the
  * batch scorecard hashes under.
  *
  * Scale posture: at 100 TB/day the band is re-calibrated on whatever
  * cadence the monitoring SLO needs and versioned like any model
  * artifact (`sources/Versioned` holds exactly this shape); the gate
  * itself adds one broadcast-hash-join probe per event at ingest
  * parallelism.
  */
object ConformalGateStream {

  /** The gate: per-event verdict against the broadcast band. Works
    * identically on a batch or streaming frame with
    * (event_id, event_type, value) columns — the spec asserts the two
    * are bit-equal. Events of a type the calibration never saw are
    * passed through as "uncalibrated" (monitoring must not silently
    * drop them — they are exactly the novel traffic worth seeing). */
  def gate(events: DataFrame, model: DataFrame): DataFrame =
    events
      .withColumn("vq", round(col("value") * 1e6).cast("long"))
      .join(broadcast(model), Seq("event_type"), "left")
      .withColumn("verdict",
        when(col("mu_q").isNull, "uncalibrated")
          .when(abs(col("vq") - col("mu_q")) <= col("q_radius"), "in_band")
          .otherwise("anomalous"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mu_q"), col("q_radius"), col("verdict"))
}
