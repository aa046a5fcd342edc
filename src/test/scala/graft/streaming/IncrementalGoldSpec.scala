package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Incremental

case class GoldEvt(user_id: Long, value: Double, ym: String)

/** Streaming + incremental materialization glued end-to-end: each
  * micro-batch appends to the partitioned source lake via foreachBatch,
  * then `Incremental.refresh` recomputes ONLY the partitions that batch
  * touched — the "incremental gold" pattern (vs the reference's full
  * overwrite per refresh). After every batch the derived table must
  * equal a from-scratch rebuild, and a batch touching one month must
  * refresh exactly that month. */
class IncrementalGoldSpec extends SparkSpec {

  test("foreachBatch drives partition-level incremental gold refresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val work = Files.createTempDirectory("incgold").toFile.getAbsolutePath
    val srcPath = s"$work/source"
    val goldPath = s"$work/gold"

    def derive(src: DataFrame): DataFrame =
      src.groupBy(col("ym"))
        .agg(count(lit(1)).as("n"), graft.Det.xsum(col("value")).as("rev"))

    var lastStale: Seq[String] = Nil
    val mem = MemoryStream[GoldEvt]
    val q = mem.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(srcPath)
        lastStale = Incremental.refresh(spark,
          spark.read.parquet(srcPath), "ym", derive, goldPath)
      }
      .start()
    try {
      // batch 1 seeds two months
      mem.addData(GoldEvt(1, 10.0, "2024-01"), GoldEvt(2, 5.0, "2024-02"))
      q.processAllAvailable()
      assert(lastStale.toSet == Set("2024-01", "2024-02"))

      // batch 2 touches ONE month: only that partition refreshes
      mem.addData(GoldEvt(3, 2.5, "2024-02"))
      q.processAllAvailable()
      assert(lastStale == Seq("2024-02"), s"stale was $lastStale")

      val gold = Incremental.read(spark, goldPath)
        .select(col("ym"), col("n"), col("rev"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val rebuilt = derive(spark.read.parquet(srcPath))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gold == rebuilt)
      assert(rebuilt == Set(("2024-01", 1L, 10.0), ("2024-02", 2L, 7.5)))
    } finally q.stop()
  }
}
