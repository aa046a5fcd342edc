package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Ingestion-time near-dup gate: stateless stream probes a static LSH
  * index; HOF signatures bit-match the batch form; known near-dups are
  * caught and distinct docs pass clean. */
class NeardupStreamSpec extends SparkSpec {

  test("HOF signature form is bit-identical to the batch minhash") {
    import spark.implicits._
    val batch = graft.llm.Dedup.minhashSig(spark, sf0001)
      .select($"doc_id", $"sig0", $"sig1", $"sig2", $"sig3",
        $"band_a", $"band_b")
    val hof = NeardupStream.signatures(
      graft.Tables(spark, sf0001, "documents"))
    assert(hof.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(hof).count() == 0)
  }

  test("streaming probe flags injected near-dups, passes distinct docs") {
    import spark.implicits._
    val index = graft.llm.Dedup.minhashSig(spark, sf0001).cache()
    index.count()

    // arrivals: near-dup copies of 5 docs (tail-salted like the sf1
    // rehearsal) + 5 fully re-hashed (distinct) docs
    val src = graft.Tables(spark, sf0001, "documents")
      .filter($"doc_id" < 10)
      .select($"doc_id", $"text")
    val arrivals = src.select(
      ($"doc_id" + 1000000L).as("doc_id"),
      when($"doc_id" % 2 === 0,
        concat($"text", lit(" "), md5($"doc_id".cast("string"))))
        .otherwise(concat_ws(" ",
          expr("transform(split(text, ' '), w -> substr(md5(w), 1, 8))")))
        .as("text"),
      $"doc_id".as("orig_id"))
    val inDir = Files.createTempDirectory("neardup_in").toFile.getAbsolutePath
    arrivals.select($"doc_id", $"text").write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val q = NeardupStream.detect(stream, index)
      .writeStream.format("memory").queryName("neardup_hits")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")

    val hits = spark.table("neardup_hits")
      .select($"doc_id", $"dup_of").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    // every near-dup arrival (even orig ids, tail-salted) must hit its
    // original; the re-hashed (odd) arrivals must hit nothing
    val expectedDup = src.select($"doc_id").as[Long].collect()
      .filter(_ % 2 == 0).toSet
    for (orig <- expectedDup)
      assert(hits.contains((orig + 1000000L, orig)),
        s"near-dup of $orig not flagged: $hits")
    val flaggedArrivals = hits.map(_._1)
    for (orig <- src.select($"doc_id").as[Long].collect().filter(_ % 2 == 1))
      assert(!flaggedArrivals.contains(orig + 1000000L),
        s"distinct doc ${orig + 1000000L} falsely flagged")
  }

  test("the probe plan is stateless: no streaming aggregation state store") {
    import spark.implicits._
    val index = graft.llm.Dedup.minhashSig(spark, sf0001)
    val inDir = Files.createTempDirectory("neardup_plan").toFile.getAbsolutePath
    graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").limit(5)
      .write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val q = NeardupStream.detect(stream, index)
      .writeStream.format("memory").queryName("neardup_plan_sink")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val plan = q.lastProgress.sources.length // progress exists
    assert(plan >= 0)
    // no stateful operators ran: statefulOperators metric absent/empty
    val sp = Option(q.lastProgress).map(_.stateOperators.length).getOrElse(0)
    assert(sp == 0, s"expected stateless plan, found $sp state operators")
  }
}
