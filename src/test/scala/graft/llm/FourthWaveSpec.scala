package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytical invariants of the fourth-wave round-6 operators (LOF,
  * chunk dedup, filter verdicts, IVF curve, SRM) beyond the value-level
  * oracles. */
class FourthWaveSpec extends SparkSpec {

  test("lof: defined for every knn node, positive, centered near 1") {
    val rows = Similarity.lofOutliers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(3), s"null LOF for vec ${r.getLong(0)}")
      assert(r.getDouble(3) > 0.0)
      assert(r.getDouble(1) >= 0.0) // kdist
      assert(r.getDouble(2) > 0.0)  // lrd
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean > 0.5 && mean < 2.0, s"mean LOF $mean far from 1 — formula suspect")
  }

  test("chunk dedup: whole-document duplicates surface as multi-doc chunks") {
    import spark.implicits._
    val dupDocs = graft.Tables(spark, sf0001, "documents")
      .groupBy(md5($"text".cast("binary")).as("h")).count()
      .filter($"count" >= 2).count()
    val multiDoc = Dedup.chunkExact(spark, sf0001)
      .filter($"n_docs" >= 2).count()
    if (dupDocs > 0)
      assert(multiDoc > 0, "whole-doc duplicates exist but no chunk spans 2 docs")
  }

  test("filter verdicts: keep is exactly the all-clear conjunction; full coverage") {
    import spark.implicits._
    val v = Curate.filterVerdicts(spark, sf0001)
    val n = graft.Tables(spark, sf0001, "documents").count()
    assert(v.count() == n, "every document must get a verdict row")
    val bad = v.filter(
      ($"keep" === 1) =!= ($"flag_too_short" + $"flag_stop_band" +
        $"flag_word_rep" + $"flag_len_band" === 0)).count()
    assert(bad == 0, "keep bit inconsistent with the flag conjunction")
  }

  test("ivf curve: recall monotone and candidates strictly increasing in nprobe") {
    val rows = Similarity.ivfCurve(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) >= a.getDouble(2) - 1e-12,
        s"recall dropped ${a.getInt(0)}->${b.getInt(0)}")
      assert(b.getLong(1) > a.getLong(1),
        s"candidate count not increasing ${a.getInt(0)}->${b.getInt(0)}")
    }
    assert(rows.last.getDouble(2) >= rows.head.getDouble(2))
  }

  test("srm: counts add up to the distinct-user total; chi2 matches by hand") {
    import spark.implicits._
    val r = graft.star.Warehouse.abSrm(spark, sf0001).collect().head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val users = graft.Tables(spark, sf0001, "events")
      .select($"user_id").distinct().count()
    assert(na + nb == users)
    val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-12)
  }
}
