package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Online record-linkage SERVING — the ingestion-time half of the
  * Fellegi–Sunter contract whose batch half is `star/Linkage`: a
  * stream of incoming records (new catalog entries, CRM rows) is
  * scored against the MATERIALIZED master index (the blocked record
  * store plus the frozen per-field u-probability model), and each
  * record leaves the hop with a link verdict — "link" to an existing
  * entity, or "new" — before it can be inserted as a fresh master row.
  * This is the dedup-at-the-door posture every MDM stack runs (the
  * streaming twin of the batch `er_matched_pairs` region).
  *
  * Execution shape: `foreachBatch`, like [[AnnServeStream]] — the
  * per-record best-match needs a window, which append-mode streaming
  * SQL cannot host statelessly, and micro-batch IS the request batch
  * in a serving tier. Zero state-store state; restart-safe
  * exactly-once from the per-epoch OVERWRITE sink
  * ([[AnnServeStream.writeEpoch]] — the `StreamCrashCommitSpec`
  * recipe). Bit-identity of streamed verdicts with the one-shot batch
  * scoring is asserted in ErServeStreamSpec.
  *
  * At 100 TB: the u-model is one broadcast row (three rationals), the
  * master index is the brand-blocked record lake partitioned by the
  * blocking key, and each micro-batch joins only the blocks its
  * records hash to — request cost scales with the batch, not the
  * master store.
  */
object ErServeStream {

  /** FS-score one batch of incoming records (key, brand, name, type,
    * size) against the master `index` (k2, brand, n2, t2, s2) under
    * the frozen 1-row `umodel` (n, ua_name, ua_type, ua_size): per
    * record, the best-weighted master candidate in its block and the
    * link/new verdict at the batch tier's threshold. Pure batch
    * function — the stream serves it per micro-batch. */
  def scoreBatch(spark: SparkSession, incoming: DataFrame, index: DataFrame,
      umodel: DataFrame, threshold: Double = 1000.0): DataFrame = {
    import spark.implicits._
    graft.functions.JaroWinkler.register(spark)
    val scored = incoming
      .join(index, Seq("p_brand"), "left")
      .crossJoin(broadcast(umodel))
      .selectExpr("key", "p_brand", "name", "k2", "n2",
        "CAST(k2 IS NOT NULL AND cast(round(jaro_winkler(name, n2) * 1e6) as bigint) >= 900000 AS BIGINT) AS g_name",
        "CAST(k2 IS NOT NULL AND p_type = t2 AS BIGINT) AS g_type",
        "CAST(k2 IS NOT NULL AND abs(p_size - s2) <= 2 AS BIGINT) AS g_size",
        "n", "ua_name", "ua_type", "ua_size")
      .withColumn("weight", when($"k2".isNull, lit(0.0)).otherwise(
        (when($"g_name" === 1, lit(0.95)).otherwise(lit(0.05))
          * when($"g_type" === 1, lit(0.9)).otherwise(lit(0.1))
          * when($"g_size" === 1, lit(0.8)).otherwise(lit(0.2)))
          / ((when($"g_name" === 1, $"ua_name").otherwise($"n" - $"ua_name")
                .cast("double") / $"n".cast("double"))
            * (when($"g_type" === 1, $"ua_type").otherwise($"n" - $"ua_type")
                .cast("double") / $"n".cast("double"))
            * (when($"g_size" === 1, $"ua_size").otherwise($"n" - $"ua_size")
                .cast("double") / $"n".cast("double")))))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy($"key")
          .orderBy($"weight".desc, $"k2".asc_nulls_last)))
      .filter($"rk" === 1)
      .select($"key", $"p_brand", $"name",
        $"k2".as("best_match"), $"weight".as("best_weight"),
        when($"weight" >= threshold, "link").otherwise("new").as("verdict"))
  }

  /** Wire a streaming record frame to the scorer: per micro-batch
    * verdicts written under `outDir/batch=<epochId>` (idempotent
    * overwrite), checkpointed at `checkpointDir`. */
  def serve(spark: SparkSession, incoming: DataFrame, index: DataFrame,
      umodel: DataFrame, outDir: String, checkpointDir: String,
      threshold: Double = 1000.0): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        AnnServeStream.writeEpoch(
          scoreBatch(spark, batch, index, umodel, threshold),
          outDir, epochId)
        ()
      }
      .start()
}
