package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT'05)
  * as a typed Aggregator — the 100 TB path for `text_word_topk`: exact
  * top-k frequency needs a full |vocabulary| shuffle; this sketch keeps
  * a fixed `capacity`-entry summary per partition and merges summaries,
  * guaranteeing any item with true count > n/capacity survives, with
  * count overestimated by at most n/capacity.
  *
  * Scale posture: constant memory per partition (capacity entries),
  * mergeable buffers (partial aggregation works), no driver collect —
  * the classic sketch trade: exactness for a bounded-error answer at a
  * tiny fraction of the shuffle.
  *
  * Result order (count overestimates) depends on merge order, so this
  * operator is NOT oracle-hashable — its guarantee is tested against
  * exact counts in HeavyHittersSpec instead.
  */
class HeavyHittersAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // evict the minimum, inherit its count + 1 (the overestimate
        // that makes the error bound provable)
        val (minK, minC) = buf.minBy(_._2)
        (buf - minK).updated(item, minC + 1)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (combined.size <= capacity) combined
    else combined.toSeq.sortBy { case (k, c) => (-c, k) }.take(capacity).toMap
  }

  /** Top items, most frequent first (ties lexicographic). Estimated
    * counts are deliberately not exposed: they are upper bounds whose
    * exact values depend on partitioning. */
  override def finish(buf: Map[String, Long]): Array[String] =
    buf.toSeq.sortBy { case (k, c) => (-c, k) }.map(_._1).toArray

  override def bufferEncoder: Encoder[Map[String, Long]] =
    implicitly[Encoder[Map[String, Long]]](Encoders.kryo[Map[String, Long]])

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
