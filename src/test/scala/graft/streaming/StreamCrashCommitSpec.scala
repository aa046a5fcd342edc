package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Incremental

/** Round-6 item closed in round 8: AtomicCommitSpec fault-injects
  * BATCH writers; this composes the same kill points with a STREAMING
  * writer. A `foreachBatch`-to-`Incremental` stream is killed mid-
  * commit at every step of the sink's commit protocol, restarted from
  * its checkpoint, and must prove (1) readers of the derived table saw
  * only the complete old snapshot while the writer lay dead — never a
  * torn one; (2) the resumed stream replays the failed micro-batch
  * EXACTLY once (same epoch id → the idempotent batch-keyed lake
  * overwrite can't double rows, and the refresh re-derives from
  * fingerprints); (3) processing continues past the crash point.
  *
  * The foreachBatch body follows the documented idempotent-sink
  * recipe: batch rows land in a `batch=<epochId>` directory with
  * overwrite semantics, so a replay of epoch N rewrites — not
  * re-appends — N's rows; the derived gold commits only through the
  * manifest swap whose crash-atomicity AtomicCommitSpec already
  * proves per step. */
class StreamCrashCommitSpec extends SparkSpec {

  test("foreachBatch-to-Incremental killed mid-commit: old-or-new, exactly-once resume") {
    import spark.implicits._
    val work = Files.createTempDirectory("crash_stream").toFile.getAbsolutePath
    val in = s"$work/in"
    val lake = s"$work/lake"
    val gold = s"$work/gold"
    val ckpt = s"$work/ckpt"

    def derive(src: DataFrame): DataFrame =
      src.groupBy(col("ym"))
        .agg(count(lit(1)).as("n"), graft.Det.xsum(col("v")).as("rev"))

    def envFile(name: String, rows: Seq[(Long, Double, String)]): Unit =
      rows.toDF("id", "v", "ym").repartition(1).write.parquet(s"$in/$name")

    def start() = spark.readStream
      .schema("id BIGINT, v DOUBLE, ym STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // idempotent lake append: epoch N always (re)writes batch=N
        batch.write.mode("overwrite").parquet(s"$lake/batch=$epochId")
        Incremental.refresh(spark,
          spark.read.parquet(s"$lake/batch=*"), "ym", derive, gold)
        () // foreachBatch wants Unit, refresh returns the stale set
      }
      .start()

    def state() = Incremental.read(spark, gold)
      .select("ym", "n", "rev").as[(String, Long, Double)].collect().toSet

    // seed: two months commit cleanly
    envFile("f1", Seq((1L, 10.0, "2024-01"), (2L, 5.0, "2024-02")))
    val q0 = start()
    try q0.processAllAvailable() finally q0.stop()
    var committed = state()
    assert(committed == Set(("2024-01", 1L, 10.0), ("2024-02", 1L, 5.0)))

    // kill the writer at each commit step of a batch touching ONE month
    var batchNo = 1
    for (step <- Seq("after-data", "before-swap")) {
      envFile(s"f_$step", Seq((100L + batchNo, 2.5, "2024-02")))
      Incremental.crashHook = s => if (s == step)
        throw new RuntimeException(s"injected writer death at $step")
      val qDead = start()
      try {
        intercept[Exception](qDead.processAllAvailable())
        assert(qDead.exception.isDefined, "query should have died")
      } finally {
        Incremental.crashHook = _ => ()
        qDead.stop()
      }
      // dead writer, live readers: the complete OLD snapshot, not torn
      assert(state() == committed, s"reader saw a torn commit after $step")

      // restart from the checkpoint: the failed epoch replays once
      val qAlive = start()
      try qAlive.processAllAvailable() finally qAlive.stop()
      committed = state()
      // gold == from-scratch rebuild of the lake (no double-count of
      // the replayed epoch, no loss)
      val rebuilt = derive(spark.read.parquet(s"$lake/batch=*"))
        .as[(String, Long, Double)].collect().toSet
      assert(committed == rebuilt, s"resumed commit diverged after $step")
      batchNo += 1
    }

    // both crash batches landed exactly once
    assert(committed == Set(
      ("2024-01", 1L, 10.0), ("2024-02", 3L, 10.0)))
    // and the lake holds each input row exactly once
    assert(spark.read.parquet(s"$lake/batch=*").count() == 4)

    // the stream keeps going after the crash window
    envFile("f_post", Seq((200L, 1.0, "2024-03")))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(state() == Set(
      ("2024-01", 1L, 10.0), ("2024-02", 3L, 10.0), ("2024-03", 1L, 1.0)))

    // dead writers' debris is reclaimable without touching live data
    val swept = Incremental.vacuum(gold)
    assert(swept.nonEmpty)
    assert(state().size == 3)
  }
}
