package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Compaction: file count collapses to the byte-sized target, content
  * is bit-identical, and the staged swap leaves no stray directories. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a small-files directory, content unchanged") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // 64 tiny files — the streaming-sink pathology in miniature
    spark.range(0, 10000).select($"id", ($"id" % 97).as("k"))
      .repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val checksum = before.agg(sum(crc32(concat_ws(":", $"id", $"k"))))
      .head.getLong(0)
    val (nBefore, nAfter) = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(nBefore == 64)
    assert(nAfter < 8, s"expected a handful of files, got $nAfter")
    val after = spark.read.parquet(dir)
    assert(after.count() == 10000)
    assert(after.agg(sum(crc32(concat_ws(":", $"id", $"k"))))
      .head.getLong(0) == checksum, "content must survive compaction bit-identically")
    assert(!new java.io.File(dir + ".old").exists())
    assert(!new java.io.File(dir + ".compact").exists())
  }
}
