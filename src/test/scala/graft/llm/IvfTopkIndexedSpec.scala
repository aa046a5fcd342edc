package graft.llm

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** `embed_ivf_topk_indexed`: the amortized ANN serving path — answers
  * come from the fingerprint-keyed materialized index, and a repeat
  * invocation over an unchanged corpus must NOT rebuild anything (the
  * manifest commit is the witness: its mtime is stable across calls). */
class IvfTopkIndexedSpec extends SparkSpec {

  test("repeat probe reuses the committed index and is deterministic") {
    val first = Similarity.ivfTopkIndexed(spark, sf0001).collect().toSeq
    assert(first.nonEmpty && first.size == 15) // 5 queries x top-3

    // locate the committed manifest for this corpus fingerprint
    val cacheRoot = Paths.get("target/graft_ivf_cache")
    val manifests = Files.walk(cacheRoot).iterator()
    val manifest = {
      val found = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      while (manifests.hasNext) {
        val p = manifests.next()
        if (p.getFileName.toString == "_MANIFEST" &&
            p.toString.contains("sf0.001")) found += p
      }
      assert(found.nonEmpty, "no committed manifest found")
      found.maxBy(Files.getLastModifiedTime(_))
    }
    val mtime = Files.getLastModifiedTime(manifest)

    val second = Similarity.ivfTopkIndexed(spark, sf0001).collect().toSeq
    assert(second == first, "repeat probe diverged")
    assert(Files.getLastModifiedTime(manifest) == mtime,
      "unchanged corpus triggered an index rebuild")
  }
}
