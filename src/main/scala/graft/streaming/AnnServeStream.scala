package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Online similarity SERVING from the partition-incrementally
  * maintained IVF index — the query-time half of the ANN contract
  * whose build half is `Similarity.autoKCentroids`/`assignToCells`
  * and whose maintenance half is `sources/Incremental`
  * (IvfIncrementalSpec): a stream of query vectors is answered with
  * exact cell-local top-k against the MATERIALIZED index, never a
  * corpus rebuild.
  *
  * Execution shape: `foreachBatch` — each micro-batch runs the plain
  * batch probe (nearest-cell assignment against the frozen broadcast
  * centroid model, one equi-join on `cell` into the index members,
  * decimal-exact cosine, per-query top-k) and appends results to the
  * sink. Per-query ranking needs a window, which append-mode streaming
  * SQL cannot host statelessly — `foreachBatch` is the production
  * posture for serving anyway (micro-batch = the request batch), keeps
  * ZERO state-store state, and inherits exactly-once sink semantics
  * from the checkpointed batch id. Bit-identity of the streamed
  * answers with the one-shot batch probe is asserted in
  * AnnServeStreamSpec.
  *
  * At 100 TB: the model is K ≈ N/250 centroids (broadcastable by
  * construction), the index is the (vec_id, cell)-keyed lake
  * partitioned by cell, and each micro-batch touches only the cells
  * its queries hash to — request cost scales with the batch, not the
  * corpus.
  */
object AnnServeStream {

  /** Exact cell-local top-k of `queries` (q_id, q_emb) against
    * `members` (vec_id, cell, embedding) under the frozen `model`
    * (cell, centroid). Pure batch function — the stream serves it per
    * micro-batch; specs diff it against the streamed union. */
  def probeBatch(spark: SparkSession, queries: DataFrame, model: DataFrame,
      members: DataFrame, k: Int = 3): DataFrame = {
    import spark.implicits._
    graft.functions.DecimalDot.register(spark)
    val dot = graft.llm.Similarity.dotSpark _
    val qCell = graft.llm.Similarity.assignToCells(spark,
        queries.select($"q_id".as("vec_id"), $"q_emb".as("embedding")), model)
      .select($"vec_id".as("q_id"), $"cell")
    val q = queries.join(qCell, "q_id")
      .selectExpr("q_id", "cell", "q_emb", s"${dot("q_emb", "q_emb")} AS qn")
    val m = members
      .selectExpr("vec_id", "cell", "embedding",
        s"${dot("embedding", "embedding")} AS mn")
    q.join(m, "cell")
      .filter($"vec_id" =!= $"q_id")
      .selectExpr("q_id", "cell", "vec_id",
        s"(${dot("q_emb", "embedding")} / sqrt(qn * mn)) AS cosine")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")))
      .filter($"rank" <= k)
      .select($"q_id", $"rank".cast("int").as("rank"), $"vec_id", $"cosine")
  }

  /** Idempotent per-epoch sink: micro-batch `epochId`'s answers land at
    * `outDir/batch=<epochId>` with mode OVERWRITE, so a replayed epoch
    * (micro-batch failed after the write but before the checkpoint
    * commit) re-writes the SAME directory instead of appending
    * duplicates — the `StreamCrashCommitSpec` recipe. Readers get
    * `batch` back as a discovered partition column. Factored out of
    * the foreachBatch closure so replay idempotence is directly
    * testable (AnnServeStreamSpec calls it twice with one epochId). */
  def writeEpoch(results: DataFrame, outDir: String, epochId: Long): Unit =
    results.write.mode("overwrite").parquet(s"$outDir/batch=$epochId")

  /** Wire a streaming query-vector frame to the probe: per micro-batch
    * exact top-k written as parquet under `outDir/batch=<epochId>`,
    * checkpointed at `checkpointDir`. Restart-safe exactly-once comes
    * from [[writeEpoch]]'s per-epoch overwrite — a replayed epoch is a
    * no-op rewrite, never an append of duplicate rows. */
  def serve(spark: SparkSession, queries: DataFrame, model: DataFrame,
      members: DataFrame, outDir: String, checkpointDir: String,
      k: Int = 3): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeEpoch(probeBatch(spark, batch, model, members, k),
          outDir, epochId)
        ()
      }
      .start()
}
