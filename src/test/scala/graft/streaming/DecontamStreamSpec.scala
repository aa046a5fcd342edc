package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Ingestion-time decontamination gate: a map-only stream scores each
  * document's 8-gram overlap against the eval-suite Bloom with no
  * streaming state; scores match the exact batch operator on the
  * fixture corpus, and the no-false-negative direction holds by
  * construction. */
class DecontamStreamSpec extends SparkSpec {

  test("bloom gate matches the exact batch decontam on the fixture corpus") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
    val bloom = DecontamStream.evalBloom(docs)
    val evalSrc = docs.agg(min($"source")).as[String].head()
    val train = docs.filter($"source" =!= evalSrc)
    val gated = DecontamStream.gate(train, bloom)
      .select($"doc_id", $"n_windows", $"n_hits", $"verdict")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = graft.llm.Curate.decontam(spark, sf0001)
      .select($"doc_id", $"n_windows", $"n_hit", $"verdict")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(gated.keySet == exact.keySet)
    for ((doc, (nw, nh, v)) <- gated) {
      val (xnw, xnh, xv) = exact(doc)
      assert(nw.toLong == xnw, s"doc $doc window count $nw vs $xnw")
      // Bloom can only over-report membership: no false negatives...
      assert(nh.toLong >= xnh, s"doc $doc under-reported hits: $nh < $xnh")
      // ...and at fpp=1e-8 sizing the fixture corpus scores clean of
      // FPs, so verdicts (and scores) coincide with the exact batch
      assert(nh.toLong == xnh, s"doc $doc FP inflation: $nh vs $xnh")
      assert(v == xv)
    }
  }

  test("the gate streams in append mode with zero state stores") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
    val bloom = DecontamStream.evalBloom(docs)
    val evalSrc = docs.agg(min($"source")).as[String].head()
    val inDir = Files.createTempDirectory("decontam_in").toFile.getAbsolutePath
    docs.filter($"source" =!= evalSrc)
      .select($"doc_id", $"text").write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val q = DecontamStream.gate(stream, bloom)
      .writeStream.format("memory").queryName("decontam_gate")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty,
      "gate must hold zero streaming state")

    val streamed = spark.table("decontam_gate")
      .select($"doc_id", $"n_hits").as[(Long, Int)].collect().toMap
    val batch = DecontamStream.gate(
      spark.read.parquet(inDir), bloom)
      .select($"doc_id", $"n_hits").as[(Long, Int)].collect().toMap
    assert(streamed == batch, "streamed scores diverge from batch gate")
    assert(streamed.nonEmpty)
  }
}
