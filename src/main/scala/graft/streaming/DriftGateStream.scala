package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift gate — the ingestion-time twin of
  * `star/Aggs.statTvdDrift`: every micro-batch of incoming documents
  * is scored for total-variation distance against the accepted
  * corpus's length distribution BEFORE it lands, so a feed that starts
  * emitting truncated or concatenated pages trips an alarm within one
  * trigger instead of at the next nightly profile.
  *
  * Statelessness trick: drift is a BATCH-relative property (one score
  * per micro-batch, not per row), so the gate runs inside
  * `foreachBatch` — the per-batch histogram + TVD is a bounded BATCH
  * aggregation planned per epoch, and the streaming query itself holds
  * ZERO state stores (no watermark, no streaming aggregation). The
  * reference histogram is a |bins|-row artifact built batch-side from
  * the accepted corpus and pinned (the model-as-artifact pattern of
  * [[DecontamStream]] / [[ConformalGateStream]]).
  *
  * Exactness contract: the TVD is the same exact integer
  * cross-multiply as the batch operator — numerator
  * Σ_b |c_batch·N_ref − c_ref·N_batch| over the union bin grid, one
  * terminal division by 2·N_batch·N_ref — and the drift VERDICT is an
  * integer comparison (5·num > 2·N_b·N_ref ⇔ TVD > 0.2), so streamed
  * verdicts are bit-identical to scoring the same rows batch-side
  * (asserted in DriftGateStreamSpec). Each epoch's verdict lands in
  * `outDir/batch=<epochId>` with overwrite — the idempotent
  * exactly-once sink recipe (StreamCrashCommitSpec), so a replayed
  * epoch cannot duplicate monitoring rows.
  *
  * Scale posture: per epoch, one map-side-combined histogram rollup
  * to |bins| cells + a broadcast join against the |bins|-row
  * reference — the gate adds one aggregation at ingest parallelism
  * regardless of corpus size; the reference re-profiles on whatever
  * cadence the monitoring SLO needs.
  */
object DriftGateStream {

  /** TVD drift threshold as an exact rational: TVD > 0.2. */
  private val ThreshNum = 5L // 5*num > 2*nb*nref  <=>  num/(2 nb nref) > 1/5

  /** The accepted corpus's length histogram: (b, cnt) over 100-char
    * buckets — the pinned reference artifact. */
  def referenceHist(docs: DataFrame): DataFrame =
    docs.select(floor(col("n_chars") / 100).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))

  /** Exact TVD of one (bounded) batch against the reference: one row
    * (n_docs, n_ref, n_bins, tvd_num, tvd, drifted). Works identically
    * on any frame with an n_chars column — the spec asserts streamed
    * == batch on the same rows. */
  def scoreBatch(batch: DataFrame, ref: DataFrame): DataFrame = {
    val bh = batch.select(floor(col("n_chars") / 100).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("scnt"))
    val grid = bh.join(ref, Seq("b"), "full_outer")
      .na.fill(0L, Seq("scnt", "cnt"))
    val tot = grid.agg(sum(col("scnt")).as("n_docs"),
      sum(col("cnt")).as("n_ref"), count(lit(1)).as("n_bins"))
    grid.crossJoin(broadcast(tot))
      .groupBy(col("n_docs"), col("n_ref"), col("n_bins"))
      .agg(sum(abs(col("scnt") * col("n_ref") - col("cnt") * col("n_docs")))
        .as("tvd_num"))
      .select(col("n_docs"), col("n_ref"), col("n_bins"), col("tvd_num"),
        (col("tvd_num").cast("double") /
          (lit(2.0) * col("n_docs").cast("double")
            * col("n_ref").cast("double"))).as("tvd"),
        (col("tvd_num") * ThreshNum >
          col("n_docs") * col("n_ref") * 2L).as("drifted"))
  }

  /** The gate: drains a streaming doc frame, scoring each micro-batch
    * against the pinned reference; verdicts land one file per epoch at
    * `outDir/batch=<epochId>` (overwrite ⇒ replay-idempotent). */
  def serve(stream: DataFrame, ref: DataFrame, outDir: String,
            checkpoint: String,
            trigger: org.apache.spark.sql.streaming.Trigger =
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : StreamingQuery = {
    val pinned = ref.localCheckpoint()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        scoreBatch(batch, pinned)
          .withColumn("batch_id", lit(epochId))
          .write.mode("overwrite").parquet(s"$outDir/batch=$epochId")
        ()
      }
      .start()
  }
}
