package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chained stateful streaming aggregation (SURVEY.md §2.9 [EXT]): a
  * fine-grained tumbling-window aggregate re-aggregated into a coarser
  * window INSIDE the same streaming query — the multi-resolution rollup
  * (5-min per-user slots → 10-min totals) that previously required two
  * queries glued by an intermediate sink. Spark 3.4+ plans multiple
  * stateful operators in one query when the second groups on
  * `window_time()` of the first's window column, which propagates the
  * event-time column through the first aggregate.
  *
  * Scale posture: both aggregates partial-aggregate map-side and their
  * state is watermark-bounded; the second operator's input is already
  * collapsed to |users x 5-min slots| rows, so its state is strictly
  * smaller than the first's. One query also means ONE checkpoint and
  * exactly-once end to end — the two-query formulation has to re-reason
  * about duplicate windows at the seam.
  */
object ChainedAgg {

  /** events(ts, user_id): per-5-min per-user counts, rolled up to
    * 10-min event totals and active-slot counts. Append mode: a 10-min
    * row emits exactly once, when the watermark passes its window end. */
  def multiResolutionRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), "10 minutes"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_user_slots"))
      .select(col("window.start").as("win_start"),
        col("n_events"), col("n_user_slots"))
}
