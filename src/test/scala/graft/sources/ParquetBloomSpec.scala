package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-level data skipping: parquet BLOOM FILTERS written per
  * column — the point-lookup companion to min/max row-group stats
  * (which only help on clustered/sorted columns; a bloom filter skips
  * row groups for equality probes on ANY distribution). At 100 TB this
  * is the difference between "scan every row group whose [min,max]
  * straddles the key" (always true for a hash-distributed id) and
  * "read 16 KB of bloom bits per row group and skip nearly all of
  * them". Spark exposes the writer knob per column; the vectorized
  * reader consumes the filters transparently under pushed equality
  * predicates. */
class ParquetBloomSpec extends SparkSpec {

  test("writer emits bloom filters; reader stays correct under equality probes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_bloom").toString
    graft.Tables(spark, sf0001, "orders")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_custkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_custkey", "10000")
      // a fully dictionary-encoded chunk makes parquet-mr DROP the bloom
      // (the dictionary already answers exact membership); disable
      // dictionary for the column so the filter is actually exercised,
      // as it would be on a high-NDV id column at real scale
      .option("parquet.enable.dictionary#o_custkey", "false")
      .parquet(dir)

    // footer-level proof: the bloom filter offset is recorded for the
    // o_custkey column chunk (parquet-hadoop is on the classpath)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(!blocks.isEmpty)
      val chunk = blocks.get(0).getColumns.asScala
        .find(_.getPath.toDotString == "o_custkey").get
      assert(chunk.getBloomFilterOffset > 0,
        "no bloom filter offset recorded for o_custkey")
      val bloom = reader.readBloomFilter(chunk)
      assert(bloom != null, "bloom filter bytes unreadable")
      // negative probe: a key far outside the domain must miss
      assert(!bloom.findHash(bloom.hash(999999999L)),
        "absent key claimed present (not a real filter?)")
    } finally reader.close()

    // read-side correctness under the pushed equality predicate
    val k = graft.Tables(spark, sf0001, "orders")
      .select($"o_custkey").limit(1).collect().head.getLong(0)
    val expected = graft.Tables(spark, sf0001, "orders")
      .filter($"o_custkey" === k).count()
    val got = spark.read.parquet(dir).filter($"o_custkey" === k).count()
    assert(got == expected && got > 0)
    val pushed = spark.read.parquet(dir).filter($"o_custkey" === k)
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("o_custkey"),
      pushed.take(1200))
  }

  private implicit class JavaListOps[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
