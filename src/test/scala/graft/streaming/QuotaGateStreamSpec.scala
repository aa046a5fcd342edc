package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import QuotaGateStream.{DocIn, Verdict}

/** Stateful per-source token-quota gate: deterministic in-batch
  * admission order, quota exhaustion persists across micro-batches,
  * and every document gets exactly one verdict. */
class QuotaGateStreamSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("quota admits in doc_id order, rejects past the cap, and remembers spending across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[DocIn]
    val q = QuotaGateStream.gate(mem.toDS(), cap = 100L)
      .writeStream.format("memory").queryName("quota_gate")
      .outputMode("append").start()
    try {
      // batch 1: source A spends 90 of 100 across three docs (out of
      // order — admission must follow doc_id, not arrival); the 40-token
      // doc_id=3 arrives FIRST but is rejected because ids 1,2 (30+60)
      // admit first and 90+40 > 100. Source B is independent.
      mem.addData(
        DocIn(3, "a", 40), DocIn(1, "a", 30), DocIn(2, "a", 60),
        DocIn(10, "b", 99))
      q.processAllAvailable()
      val b1 = spark.table("quota_gate").as[Verdict].collect()
        .map(v => v.doc_id -> v).toMap
      assert(b1.size == 4)
      assert(b1(1L).verdict == "admit" && b1(1L).spent_before == 0L)
      assert(b1(2L).verdict == "admit" && b1(2L).spent_before == 30L)
      assert(b1(3L).verdict == "reject" && b1(3L).spent_before == 90L)
      assert(b1(10L).verdict == "admit" && b1(10L).spent_before == 0L)

      // batch 2: source A has 10 tokens left — a 10-token doc admits
      // (exactly exhausting the cap), the next rejects; source B has 1
      // left and rejects a 2-token doc. Cross-batch state is the claim.
      mem.addData(
        DocIn(4, "a", 10), DocIn(5, "a", 1),
        DocIn(11, "b", 2))
      q.processAllAvailable()
      val b2 = spark.table("quota_gate").as[Verdict].collect()
        .map(v => v.doc_id -> v).toMap
      assert(b2(4L).verdict == "admit" && b2(4L).spent_before == 90L)
      assert(b2(5L).verdict == "reject" && b2(5L).spent_before == 100L)
      assert(b2(11L).verdict == "reject" && b2(11L).spent_before == 99L)
      // invariant: admitted tokens per source never exceed the cap
      val spentBySource = b2.values.filter(_.verdict == "admit")
        .groupBy(_.source).view.mapValues(_.map(_.n_tokens).sum)
      spentBySource.foreach { case (_, tok) => assert(tok <= 100L) }
    } finally {
      spark.streams.active.foreach(_.stop())
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
