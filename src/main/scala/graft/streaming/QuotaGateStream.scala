package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-source token-budget enforcement — the stateful twin
  * of `llm/Curate`'s batch `corpus_source_cap`: as documents arrive,
  * each source spends from a fixed token quota and every document
  * leaves the hop with an admit/reject verdict, so no source can
  * dominate the training mix no matter how fast it crawls. The batch
  * operator decides the cap retrospectively; this gate enforces it AT
  * INGEST, which is where a runaway feed actually has to be stopped.
  *
  * Built on `transformWithState` (the AlertStream pattern): one
  * ValueState[Long] per source holds tokens spent so far; each
  * micro-batch's rows are processed in deterministic (doc_id) order so
  * the admitted set is independent of partition order; every document
  * emits exactly one verdict row (admit, or reject with the quota
  * level that refused it). State persists across micro-batches and
  * restarts (checkpointed; proven by the stop/append/restart spec) —
  * a source that exhausts its quota in batch 1 stays exhausted in
  * batch 9.
  *
  * Scale posture: state is ONE counter per source (bytes, not
  * documents); the shuffle is the groupByKey on source — the same
  * key the batch cap operator aggregates on; verdicts stream out in
  * append mode. At 100 TB/day the only growth axis is |sources|. */
object QuotaGateStream {

  case class DocIn(doc_id: Long, source: String, n_tokens: Long)
  case class Verdict(doc_id: Long, source: String, n_tokens: Long,
    spent_before: Long, verdict: String)

  class QuotaProcessor(cap: Long)
      extends StatefulProcessor[String, DocIn, Verdict] {
    @transient private var spent: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      spent = getHandle.getValueState[Long]("spent",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[Verdict] = {
      // deterministic admission order within the batch: doc_id — the
      // admitted set must not depend on partition arrival order
      val sorted = rows.toSeq.sortBy(_.doc_id)
      var s = if (spent.exists()) spent.get() else 0L
      val out = Seq.newBuilder[Verdict]
      sorted.foreach { d =>
        if (s + d.n_tokens <= cap) {
          out += Verdict(d.doc_id, key, d.n_tokens, s, "admit")
          s += d.n_tokens
        } else {
          out += Verdict(d.doc_id, key, d.n_tokens, s, "reject")
        }
      }
      spent.update(s)
      out.result().iterator
    }
  }

  /** Apply the quota gate to a (possibly streaming) doc frame. */
  def gate(ds: Dataset[DocIn], cap: Long): Dataset[Verdict] = {
    implicit val outEnc = Encoders.product[Verdict]
    ds.groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new QuotaProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
