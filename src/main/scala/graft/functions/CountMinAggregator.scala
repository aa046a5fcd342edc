package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J.Algorithms
  * 2005) as a typed Aggregator — the PRODUCTION form of the
  * oracle-checked GROUP BY formulation in `text_cms_estimate`
  * (TextStats): d salted hash rows × w counters, each input token
  * incrementing one cell per row; a point estimate is the min of a
  * token's d cells, an overestimate with error ≤ εN (ε = e/w) with
  * probability 1−δ (δ = e^−d).
  *
  * Determinism: counters are ADDITIVE, so merge order and partition
  * count can never change a cell — the buffer is bit-stable at any
  * parallelism (same property that made the SQL form hash-checkable
  * against DuckDB). Hashing is salted md5 over the token bytes —
  * identical to the SQL form by construction, asserted in CmsSpec.
  *
  * Scale posture: constant memory (d·w longs) per partition,
  * mergeable buffers (partial aggregation works), no driver collect;
  * the sketch answers point frequency queries over 100 TB with one
  * pass and a 2 KB state.
  */
class CountMinAggregator(val d: Int, val w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var j = 0
    while (j < d) {
      buf(j * w + CountMinAggregator.bucket(j, tok, w)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {

  /** Cell index for row j — first 8 md5-hex chars of "j:tok" mod w,
    * the EXACT hashing of the SQL/DuckDB formulation
    * (`text_cms_estimate`), so the two forms are interchangeable. */
  def bucket(j: Int, tok: String, w: Int): Int = {
    val hex = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$j:$tok").substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % w).toInt
  }

  /** Point-frequency estimate from a finished sketch. */
  def estimate(cells: Array[Long], d: Int, w: Int, tok: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = cells(j * w + bucket(j, tok, w))
      if (c < best) best = c
      j += 1
    }
    best
  }
}
