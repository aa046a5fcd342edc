package graft.llm

import graft.SparkSpec

/** URL canonicalization dedup: the four syntactic variants of each
  * logical page collapse to one canonical URL with no normalization
  * residue. */
class UrlCanonicalSpec extends SparkSpec {

  test("four variants per page collapse to one clean canonical URL") {
    import spark.implicits._
    val got = Dedup.urlCanonical(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(got.map(_._2).sum == nDocs) // every doc lands in one group
    assert(got.size == ((nDocs + 3) / 4)) // one group per logical page
    got.foreach { case (url, n, minDoc, maxDoc) =>
      assert(n >= 1 && n <= 4)
      assert(minDoc / 4 == maxDoc / 4) // members share the logical page
      // normalization residue checks
      assert(url == url.toLowerCase)
      assert(!url.contains(":443"))
      assert(!url.contains("#"))
      assert(!url.contains("utm_"))
      assert(!url.contains("/?"))
      // params are sorted: id=... before v=2
      val q = url.split("\\?", 2)(1)
      assert(q.split("&").sorted.mkString("&") == q)
    }
    // full groups collapse all four variant spellings
    assert(got.count(_._2 == 4) >= got.size - 1)
  }
}
