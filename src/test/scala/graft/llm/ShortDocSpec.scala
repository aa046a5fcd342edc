package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shingle-edge behavior for documents shorter than the 3-gram window:
  * Spark's `sequence(0, size-3)` auto-steps -1 on a negative span and
  * would emit bogus partial shingles (concat_ws silently skips the
  * null out-of-range lookups) that DuckDB's `range()` (empty on a
  * negative span) never produces. The pipeline contract is that <3-token
  * docs have NO shingles and hence no MinHash signature, no jaccard
  * rows, and no contamination hits — this spec pins that on a fixture
  * the sf test data doesn't cover (its shortest doc has 10 tokens). */
class ShortDocSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shortdoc").toString
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "eval", 22L), // eval side, 4 tokens
      (1L, "alpha beta", "en", "eval", 10L),             // eval side, 2 tokens
      (5L, "alpha beta gamma delta", "en", "web", 22L),  // corpus, shares 2 shingles with 0
      (6L, "alpha beta", "en", "web", 10L),              // corpus, 2 tokens -> no shingles
      (7L, "solo", "en", "web", 4L)                      // corpus, 1 token -> no shingles
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash signatures exclude <3-token docs") {
    val ids = Dedup.minhashQuery(spark, fixtureDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 5L), s"got $ids")
  }

  test("contamination counts only whole 3-gram shingles") {
    val rows = Dedup.contamination(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 5 shares both of doc 0's shingles; the 2-token docs 1/6
    // contribute nothing (a bogus "alpha beta" partial shingle on both
    // sides would otherwise fabricate pairs)
    assert(rows.toSeq == Seq((5L, 0L, 2L)), s"got ${rows.toSeq}")
  }

  test("ngram jaccard emits no rows for shingle-less docs") {
    val rows = Dedup.ngramJaccard(spark, fixtureDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => Set(0L, 5L)(a) && Set(0L, 5L)(b) },
      s"got ${rows.toSeq}")
  }
}
