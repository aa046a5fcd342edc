package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass data-quality observability (SURVEY.md §2 [EXT]): attach
  * aggregate metrics to a frame with `Dataset.observe` so they are
  * collected DURING the job that produces the data — row counts, null
  * rates, domain violations ride the same scan instead of a second
  * audit pass over the output (what `dq_checks` does post-hoc, this
  * does in-flight).
  *
  * Scale posture: observed metrics are accumulator-style partial
  * aggregates merged on the driver — zero extra shuffle, zero extra
  * scan, constant driver memory per metric. On a stream the same call
  * surfaces per-micro-batch metrics in `QueryProgress.observedMetrics`,
  * which is the hook a production pipeline wires to its alerting.
  */
object Observe {

  /** The standard ingest health metrics for a silver-shaped frame:
    * total rows, rows with a NULL in `keyCol`, and rows failing
    * `domainOk` — all computed in the producing job. */
  def withIngestMetrics(df: DataFrame, obs: Observation,
      keyCol: String, domainOk: Column): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col(keyCol).isNull.cast("long")).as("n_null_key"),
      sum((!domainOk).cast("long")).as("n_domain_bad"))
}
