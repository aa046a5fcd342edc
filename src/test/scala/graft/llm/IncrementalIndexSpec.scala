package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Composition gate: the near-dup signature INDEX is maintained
  * incrementally — when one source's documents change, only that
  * source's signature partition recomputes (Incremental.refresh over
  * the map-only HOF signature derivation). This is how the static
  * index probed by NeardupStream stays fresh at 100 TB: signature
  * maintenance cost ∝ changed partitions, never the corpus. */
class IncrementalIndexSpec extends SparkSpec {

  private def derive(src: DataFrame): DataFrame =
    graft.streaming.NeardupStream.signatures(src)
      .join(src.select(col("doc_id"), col("source")), "doc_id")

  test("signature index refreshes only the changed source partition") {
    val work = Files.createTempDirectory("inc_idx").toFile.getAbsolutePath
    val srcPath = s"$work/docs"
    val idxPath = s"$work/sig_index"
    graft.Tables(spark, sf0001, "documents").write.parquet(srcPath)
    def docs = spark.read.parquet(srcPath)

    // initial build covers every source
    val first = graft.sources.Incremental.refresh(
      spark, docs, "source", derive, idxPath)
    val sources = docs.select("source").distinct().count()
    assert(first.size == sources && sources > 1)

    // unchanged corpus: no partition recomputes
    assert(graft.sources.Incremental.refresh(
      spark, docs, "source", derive, idxPath).isEmpty)

    // one new doc in ONE source -> exactly that partition refreshes
    val target = docs.select(col("source")).orderBy("source").head.getString(0)
    docs.filter(col("source") === target).limit(1)
      .withColumn("doc_id", lit(99999999L))
      .write.mode("append").parquet(srcPath)
    val third = graft.sources.Incremental.refresh(
      spark, docs, "source", derive, idxPath)
    assert(third == Seq(target), s"stale set was $third")

    // incremental index == batch rebuild, and the new doc is indexed
    val batch = derive(docs)
    val incremental = graft.sources.Incremental.read(spark, idxPath)
      .select(batch.columns.map(col): _*)
    assert(incremental.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(incremental).count() == 0)
    assert(incremental.filter(col("doc_id") === 99999999L).count() == 1)
  }
}
