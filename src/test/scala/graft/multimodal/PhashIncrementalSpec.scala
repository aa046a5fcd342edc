package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Composition gate promised by the image-dedup tier: at 100 TB the
  * phash band index the streaming gate probes is a MATERIALIZED
  * artifact maintained partition-incrementally — decode+hash runs only
  * over mutated lake partitions, never the whole lake. The LSH text
  * index (IncrementalIndexSpec) and the IVF index (IvfIncrementalSpec)
  * have this proof; this is the multimodal twin: the hash is a pure
  * per-image function, so `PhashGateStream.buildIndex` is a valid
  * partition-incremental derivation, and the streaming gate served
  * FROM the materialized index is bit-identical to one probing a
  * freshly built one. */
class PhashIncrementalSpec extends SparkSpec {

  test("phash index refreshes only the mutated media_type partition; gate served from the index is bit-identical") {
    import spark.implicits._
    val work = Files.createTempDirectory("phash_idx").toFile.getAbsolutePath
    val lakePath = s"$work/images.parquet"
    val idxPath = s"$work/phash_index"
    Media.imageTable(spark, sf0001).write.parquet(lakePath)
    def lake = spark.read.parquet(lakePath)
    def derive(src: DataFrame): DataFrame =
      Media.phashBands(
        src.as[Media.MediaFile].mapPartitions(Media.hashBatch)
          .select($"doc_id", $"phash_hi", $"phash_lo"))
        .join(src.select($"doc_id", $"media_type"), "doc_id")

    // initial build covers both media_type partitions
    val first = graft.sources.Incremental.refresh(
      spark, lake, "media_type", derive, idxPath)
    assert(first.toSet == Set("image/png", "image/bmp"))

    // unchanged lake: nothing recomputes
    assert(graft.sources.Incremental.refresh(
      spark, lake, "media_type", derive, idxPath).isEmpty)

    // one new png lands -> exactly the png partition refreshes
    lake.filter($"media_type" === "image/png").limit(1)
      .withColumn("doc_id", lit(77777777L))
      .write.mode("append").parquet(lakePath)
    val third = graft.sources.Incremental.refresh(
      spark, lake, "media_type", derive, idxPath)
    assert(third == Seq("image/png"), s"stale set was $third")

    // materialized index == batch rebuild
    val batch = derive(lake)
    val index = graft.sources.Incremental.read(spark, idxPath)
      .select(batch.columns.map(col): _*)
    assert(index.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(index).count() == 0)
    assert(index.filter($"doc_id" === 77777777L).count() == 1)

    // the gate probing the MATERIALIZED index answers bit-identically
    // to one probing a freshly built index (the serving claim)
    val incoming = Media.imageTable(spark, sf0001).limit(20)
      .withColumn("doc_id", $"doc_id" + 1000000000L)
      .as[Media.MediaFile]
    def verdicts(idx: DataFrame) =
      graft.streaming.PhashGateStream.detect(incoming, idx)
        .select($"doc_id", $"dup_of", $"hamming", $"band")
        .as[(Long, Long, Int, String)].collect().toSet
    val served = verdicts(index.drop("media_type"))
    val fresh = verdicts(graft.streaming.PhashGateStream.buildIndex(
      lake.as[Media.MediaFile]))
    assert(served.nonEmpty && served == fresh,
      "gate served from the incremental index diverges from fresh build")
  }
}
