package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.9 [EXT]): attribute each
  * purchase to a click by the same user within the preceding 5 minutes
  * — the canonical streaming attribution shape (the batch twin is the
  * as-of/range join family, `star/Joins`).
  *
  * State-boundedness is the 100 TB-stream point: BOTH sides carry
  * watermarks and the join condition carries a two-sided time bound, so
  * Spark evicts click state once `purchase watermark > click_ts + 5
  * min` and purchase state once it falls behind the click watermark —
  * without either bound the join buffers a side forever. Inner join =
  * no late-emission ambiguity; state store size is O(events inside the
  * watermark horizon), independent of stream length.
  */
object StreamJoin {

  /** `clicks`/`purchases`: streaming frames with (user_id, event_id,
    * ts[, value]). Returns one row per attributed (click, purchase)
    * pair. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p, expr(
      """c_user = p_user AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 5 minutes""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  /** Left-outer variant of [[clickToPurchase]]: every click flows
    * through, attributed where a purchase exists and with NULLs once the
    * join state for it expires. The semantic subtlety that makes this a
    * distinct operator (not a join-type flag): an unmatched click CANNOT
    * be emitted when first seen — a matching purchase may still arrive —
    * so Spark holds it and emits the null-padded row only after the
    * watermark passes `click_ts + 5 min`, i.e. when a match has become
    * impossible. Same two-sided state eviction as the inner form; output
    * latency (one watermark horizon) is the price of the outer
    * guarantee. */
  def clickToPurchaseOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p, expr(
      """c_user = p_user AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 5 minutes""".stripMargin),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_value"))
  }

  /** FULL-outer variant — the reconciliation join that completes the
    * stream-stream matrix (inner / left-outer / full-outer): every
    * click AND every purchase flows through, matched where the 5-min
    * attribution window holds, null-padded on ITS side once the
    * watermark proves a match impossible. The two unmatched classes
    * expire on different horizons (a click at `click_ts + 5 min`, a
    * purchase as soon as the watermark passes `purchase_ts` — no
    * earlier click can arrive), which is exactly the two-ledger audit
    * semantics: purchases with no attributable click surface as
    * anomalies rather than vanishing. */
  def clickToPurchaseFull(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    c.join(p, expr(
      """c_user = p_user AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 5 minutes""".stripMargin),
      "fullOuter")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("click_id"), col("purchase_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-static dimension enrichment — the most common production
    * streaming join: each micro-batch hash-joins against a BATCH
    * dimension frame. Stateless by construction (the static side is
    * re-planned per batch, so no stream state accumulates, and a small
    * dimension broadcasts), which is why it needs no watermark — the
    * scale contrast to [[clickToPurchase]]'s stateful two-sided join.
    * Left join: an event whose dimension row is missing must flow
    * through (with NULLs) rather than silently drop. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim.select(col("user_id").as("d_user"), col("segment"))),
      events("user_id") === col("d_user"), "left")
      .drop("d_user")
}
