package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.multimodal.Media

/** Routed ingest dedup, end to end: the router prices the standing
  * index with the exact `dedup_route_audit` rule, a HEALTHY corpus
  * takes the pairwise band-probe path, a hash-DEGENERATE corpus takes
  * the coarse exact-key path, and on both routes the streamed verdicts
  * are bit-identical to the batch form. */
class RoutedDedupStreamSpec extends SparkSpec {

  test("router verdicts agree with the registered dedup_route_audit") {
    val audit = graft.llm.Dedup.routeAudit(spark, sf0001)
      .select(col("family"), col("route"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val sig = graft.llm.Dedup.minhashSig(spark, sf0001)
    assert(RoutedDedupStream.routeOf(
      RoutedDedupStream.textBandKeys(sig)) == audit("text_minhash"))
    val ph = Media.phashIndex(spark, sf0001)
    assert(RoutedDedupStream.routeOf(
      RoutedDedupStream.phashBandKeys(ph)) == audit("media_phash"))
  }

  test("healthy corpus: gate routes pairwise, stream == batch") {
    import spark.implicits._
    val index = graft.llm.Dedup.minhashSig(spark, sf0001).localCheckpoint()
    // arrivals: one tail-salted near-dup + one fully re-hashed doc
    val src = graft.Tables(spark, sf0001, "documents")
      .filter($"doc_id" < 2).select($"doc_id", $"text")
    val arrivals = src.select(($"doc_id" + 1000000L).as("doc_id"),
      when($"doc_id" % 2 === 0,
        concat($"text", lit(" "), md5($"doc_id".cast("string"))))
        .otherwise(concat_ws(" ",
          expr("transform(split(text, ' '), w -> substr(md5(w), 1, 8))")))
        .as("text"))
    val inDir = Files.createTempDirectory("routed_h").toFile.getAbsolutePath
    arrivals.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val (route, gated) = RoutedDedupStream.textGate(stream, index)
    assert(route == RoutedDedupStream.Pairwise)
    val q = gated.writeStream.format("memory").queryName("routed_h")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty, "gate must be stateless")

    val streamed = spark.table("routed_h")
      .as[(Long, Long, Double, String)].collect().toSet
    val batch = RoutedDedupStream.textGate(
      spark.read.parquet(inDir), index)._2
      .as[(Long, Long, Double, String)].collect().toSet
    assert(streamed == batch && streamed.exists(_._1 == 1000000L))
  }

  test("degenerate corpus: gate routes coarse, output is contracted, stream == batch") {
    import spark.implicits._
    // 200 standing documents with IDENTICAL text — every band bucket
    // holds all 200, so pairwise banding would emit 2·C(200,2) = 39 800
    // candidate pairs against a 32·200 = 6 400 budget
    val const = "the quick brown fox jumps over the lazy dog again and again"
    val standing = spark.range(200)
      .select($"id".as("doc_id"), lit(const).as("text"))
    val index = NeardupStream.signatures(standing).localCheckpoint()
    assert(RoutedDedupStream.routeOf(
      RoutedDedupStream.textBandKeys(index)) == RoutedDedupStream.Coarse)

    // arrivals: one exact member of the family + one fresh document
    val arrivals = Seq(
      (9001L, const),
      (9002L, "completely different words that no standing doc contains ever"))
      .toDF("doc_id", "text")
    val inDir = Files.createTempDirectory("routed_d").toFile.getAbsolutePath
    arrivals.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val (route, gated) = RoutedDedupStream.textGate(stream, index)
    assert(route == RoutedDedupStream.Coarse)
    val q = gated.writeStream.format("memory").queryName("routed_d")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty, "gate must be stateless")

    val streamed = spark.table("routed_d")
      .as[(Long, Long, Double, String)].collect().toSet
    val batch = RoutedDedupStream.textGate(
      spark.read.parquet(inDir), index)._2
      .as[(Long, Long, Double, String)].collect().toSet
    assert(streamed == batch)
    // THE CONTRACTION CLAIM: the family member hits its min-doc
    // representative exactly once — not once per standing copy — and
    // the fresh document passes clean
    assert(streamed == Set((9001L, 0L, 1.0, "exact_sig")),
      s"coarse gate must contract the family to one verdict: $streamed")
  }

  test("degenerate phash frame routes coarse; exact-hash image gate, stream == batch") {
    import spark.implicits._
    // 100 DISTINCT hashes sharing band b0 (low 16 bits all zero): the
    // one-hot-band degeneracy of the r11 ×100 image corpus
    val degenerate = spark.range(100).selectExpr("id AS doc_id",
      "shiftleft(id, 16) + id AS phash_hi", "shiftleft(id, 16) AS phash_lo")
    assert(RoutedDedupStream.routeOf(
      RoutedDedupStream.phashBandKeys(degenerate)) ==
      RoutedDedupStream.Coarse)

    // coarse image gate over REAL images: re-ingested byte-identical
    // copies must flag their lake twin at hamming 0, once each
    val lake = Media.imageTable(spark, sf0001)
    val index = lake.mapPartitions(Media.hashBatch)
      .select($"doc_id", $"phash_hi", $"phash_lo").localCheckpoint()
    val inDir = Files.createTempDirectory("routed_p").toFile.getAbsolutePath
    lake.filter($"doc_id" < 3)
      .withColumn("doc_id", $"doc_id" + 1000000000L)
      .write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream
      .schema("doc_id LONG, media_type STRING, content BINARY")
      .parquet(inDir).as[Media.MediaFile]
    val q = RoutedDedupStream.coarsePhashDetect(stream, index)
      .writeStream.format("memory").queryName("routed_p")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not drain")
    val streamed = spark.table("routed_p")
      .as[(Long, Long, Int, String)].collect().toSet
    val batch = RoutedDedupStream.coarsePhashDetect(
      spark.read.parquet(inDir).as[Media.MediaFile], index)
      .as[(Long, Long, Int, String)].collect().toSet
    assert(streamed == batch)
    for (d <- 0L until 3L)
      assert(streamed.exists(h => h._1 == d + 1000000000L && h._3 == 0),
        s"copy of $d not flagged at hamming 0: $streamed")
  }
}
