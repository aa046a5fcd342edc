package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02; Beyer et
  * al. SIGMOD'07 for the unbiased estimator) as a typed Aggregator —
  * the theta-sketch-style answer to SET-EXPRESSION cardinalities that
  * HLL cannot give: because the summary IS a sample of the hash space
  * (the k smallest 63-bit hashes, kept sorted and distinct), sketches
  * of different segments compose — union = k smallest of the merged
  * arrays, and an INTERSECTION estimate falls out of counting union
  * survivors present in both sides — all with plain array built-ins
  * (`array_intersect`, `slice`), no re-scan of the data.
  *
  * Estimator: with theta = the k-th smallest normalized hash,
  * distinct ~= (k-1)/theta (unbiased); error ~ 1/sqrt(k-2). When a
  * group has FEWER than k distinct hashes the sketch is the exact
  * distinct hash set and every estimate is exact (asserted in
  * KmvSpec).
  *
  * Determinism: input hashing is the caller's (xxhash64 of the key —
  * no RNG, no seed to version); the buffer is a sorted distinct array,
  * so merge order cannot change the result — unlike the space-saving
  * sketch, KMV output is bit-stable at any partitioning.
  *
  * Scale posture: constant memory per partition (k longs), mergeable
  * buffers (partial aggregation works), no driver collect. The O(k)
  * sorted-array insert is fine for the k<=1024 regime this targets; a
  * max-heap drops it to O(log k) without changing the contract.
  */
class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val h = hash & Long.MaxValue // fold into the non-negative half-line
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present (KMV is a set)
    else if (buf.length < k) insertAt(buf, -(pos + 1), h)
    else if (h < buf(buf.length - 1))
      insertAt(buf.dropRight(1), -(pos + 1), h)
    else buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  private def insertAt(buf: Array[Long], at: Int, v: Long): Array[Long] = {
    val out = new Array[Long](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, at)
    out(at) = v
    System.arraycopy(buf, at, out, at + 1, buf.length - at)
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketchAggregator {
  /** Distinct estimate from a sketch built with parameter k: exact
    * count when the sketch is unsaturated, else (k-1)/theta. */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch(k - 1).toDouble / Long.MaxValue.toDouble)
}
