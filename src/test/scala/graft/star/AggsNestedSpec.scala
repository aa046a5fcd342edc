package graft.star

import graft.SparkSpec

/** Spark-side gate for the NESTED form of the array-collect family.
  * The oracle gate compares the concat_ws string twin
  * (`agg_array_collect`); this spec pins the ARRAY column itself —
  * sorted element order, set semantics, and agreement with the string
  * twin — which the driver's comparator cannot order rows on. */
class AggsNestedSpec extends SparkSpec {

  test("arrayCollectNested: sorted distinct arrays agree with the string twin") {
    val nested = Aggs.arrayCollectNested(spark, sf0001).collect()
    assert(nested.nonEmpty)
    val twin = Aggs.arrayCollect(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2), r.getString(3))).toMap
    nested.foreach { r =>
      val seg = r.getString(0)
      val arr = r.getSeq[String](1)
      // sorted, distinct
      assert(arr == arr.sorted, s"$seg: not sorted: $arr")
      assert(arr.distinct == arr, s"$seg: duplicates: $arr")
      // agrees with the oracle-gated string twin column-for-column
      val (csv, n, first) = twin(seg)
      assert(arr.mkString(",") == csv, s"$seg: array != csv twin")
      assert(arr.size == n && arr.head == first, s"$seg: size/first mismatch")
    }
  }
}
