package graft.star

import graft.SparkSpec

/** Plan-shape gate (SURVEY.md §4): the physical plans the 100 TB story
  * depends on, asserted so regressions surface as test failures rather
  * than silent slowdowns. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("broadcast dimension join compiles to BroadcastHashJoin") {
    assert(plan("join_broadcast_dim").contains("BroadcastHashJoin"))
  }

  test("range join broadcasts the 50-row side (no cartesian shuffle)") {
    val p = plan("join_range")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("global top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("rollup/cube aggregate through Expand under partial aggregation") {
    assert(plan("agg_rollup").contains("Expand"))
    assert(plan("agg_cube").contains("Expand"))
  }

  test("gold aggregates are partial+final hash aggregates") {
    // round 14: gold_carrier is SERVED from the incremental
    // materialization — the aggregate now lives in the build lambda
    // the refresh runs per stale month; assert the plan shape there
    val p = graft.pipeline.Gold.goldCarrierBuild(
      graft.pipeline.FlightPipeline.master(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("semi and anti joins use the dedicated join types") {
    assert(plan("join_semi").toLowerCase.contains("leftsemi"))
    assert(plan("join_anti").toLowerCase.contains("leftanti"))
  }

  test("silver pipelines stay free of (slow) Scala/Python UDF nodes") {
    for (q <- Seq("silver_json_pipeline", "silver_flightize",
      "dedup_minhash_sig", "text_stats")) {
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q has a UDF node")
    }
  }

  test("silver total order avoids RangePartitioning (no sampling re-eval)") {
    // a global orderBy would add a range exchange whose bound-sampling
    // job re-runs the whole decode/parse chain (measured 2x the query);
    // the single-partition sortWithinPartitions form must stay
    for (q <- Seq("silver_json_pipeline", "silver_avro_capture")) {
      val p = plan(q).toLowerCase
      assert(!p.contains("rangepartitioning"), s"$q re-grew a range sort")
      assert(p.contains("sort"), s"$q lost its deterministic order")
    }
  }

  test("embedding cosine path is codegen'd (no interpreted HOF lambda)") {
    // the aggregate() higher-order function runs interpreted (measured
    // 25x on minhash, 2x of the whole r1 bench on the pair join) — the
    // unrolled decimal sum must stay out of lambda land
    // (AQE prints isFinalPlan=false without codegen spans pre-execution,
    // so assert the absence of the interpreted form, not the span)
    for (q <- Seq("embed_neardup_pairs", "embed_cosine_topk")) {
      val p = plan(q)
      assert(!p.contains("lambdafunction"), s"$q uses an interpreted lambda")
      assert(!p.contains("aggregate("), s"$q re-grew the aggregate() HOF")
    }
  }

  test("minhash signature stage aggregates map-side before its shuffle") {
    val p = plan("dedup_minhash_sig")
    // string min buffers are var-length, so Spark picks SortAggregate;
    // what matters for scale is the partial (map-side) pass below the
    // exchange, shrinking |docs x shingles| rows to |docs| pre-shuffle
    assert(p.contains("partial_min"), p)
    assert(p.indexOf("Exchange hashpartitioning") < p.indexOf("partial_min"), p)
  }

  test("banded range join compiles to a hash join, not a nested loop") {
    // the rewrite's whole value: one bucket lookup per probe row
    // instead of |build| predicate evaluations
    val p = plan("join_range_banded")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("SRP-LSH candidates come from equi band joins, never a cartesian") {
    // the whole point of banding is bounding the pair join: both
    // candidate branches must be hash joins on the band keys; a
    // cartesian/BNLJ here means |corpus|^2 at scale
    val p = plan("embed_srp_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).nonEmpty, p)
  }

  test("tfidf gets N via a broadcast 1-row join, not a driver collect") {
    val p = plan("text_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("corpus_prep keeps partial aggregation below its dedup shuffle") {
    val p = plan("corpus_prep")
    assert(p.contains("partial_min") || p.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q6 pushes all three predicates into the parquet scan") {
    val p = plan("tpch_q6")
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scanLine.contains(c), s"$c not pushed: $scanLine")
    assert(p.contains("HashAggregate"))
  }

  test("tpch q1 is one partial+final aggregate pair, no extra exchange") {
    val p = plan("tpch_q1")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    // scan fan-out + aggregate exchange + output range sort only
    assert(p.split("Exchange").length - 1 <= 3, s"too many exchanges:\n$p")
  }

  test("tpch q3/q18 end in TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("tpch_q3", "tpch_q18")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
      assert(!p.toLowerCase.contains("rangepartitioning"), s"$q global-sorts")
    }
  }

  test("NOT IN plans as a null-aware anti join (the only correct hash form)") {
    // both branches are anti joins; the NOT IN one must be the
    // null-aware broadcast variant — a plain anti join would silently
    // return the wrong (non-empty) answer under the subquery's NULL
    val p = plan("sql_not_in_null")
    assert("LeftAnti".r.findAllIn(p).length >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("full outer ledger join keeps FullOuter (no side dropped)") {
    val p = plan("join_full_outer")
    assert(p.contains("FullOuter"), p)
  }

  test("per-group top-N inserts WindowGroupLimit (partial per-partition heaps)") {
    // Spark's rank-filter pushdown: rn <= k over a window becomes a
    // WindowGroupLimit below the exchange, so each map task forwards at
    // most k rows per group instead of sorting whole partitions — the
    // grouped analogue of TakeOrderedAndProject, and the reason the
    // window top-N form scales to 100 TB
    val p = plan("window_topn_rank")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("A-ES weighted sample's per-stratum top-n is WindowGroupLimit-bounded") {
    // corpus_weighted_sample's scale claim: the rank(≤n) filter over the
    // per-language key window becomes a partial WindowGroupLimit below
    // the exchange — the bounded per-partition heap IS the A-ES
    // reservoir, so map tasks never shuffle more than n rows per stratum
    val p = plan("corpus_weighted_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // The 100 TB row-level runtime filter: a selective predicate on the
    // build side makes Catalyst inject bloom_filter_agg + might_contain
    // on the probe side, pruning shuffle input at the scan. Raw scans
    // here because Tables' harness-only fan-out repartition sits between
    // scan and join and blocks the injection pattern — at scale that
    // branch adds NO node (scan parallelism >= cores), so production
    // plans look exactly like this one. Thresholds are lowered only
    // because local test files are far below the 10 MB/10 GB defaults.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val pt = spark.read.parquet(s"$sf0001/part.parquet")
        .filter($"p_size" === 1)
      val j = li.join(pt, $"l_partkey" === $"p_partkey")
        .groupBy($"p_size").count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("EWMA smoother collapses facts before its single bounded window") {
    // one partial+final aggregate pair to |months| rows, then the lag
    // window; a second exchange before the aggregate would mean the
    // window ran over raw facts
    val p = plan("orders_ewma")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Window"), p)
    assert(!p.toLowerCase.contains("rangepartitioning") ||
      p.indexOf("Window") < p.toLowerCase.indexOf("rangepartitioning"), p)
  }

  test("chi-square runs on the bounded contingency grid, not the corpus") {
    // the corpus-sized input must collapse via partial aggregation; the
    // grid joins afterwards are broadcast (no corpus-keyed exchange)
    val p = plan("stat_chi2")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup-signal agreement joins pair sets with a real FULL OUTER") {
    val p = plan("dedup_method_agreement")
    assert(p.contains("FullOuter"), p)
  }

  test("PPJoin stays equi-join only — no nested loop, no cartesian") {
    val p = plan("dedup_ppjoin")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("string-metric queries run native expressions, not UDFs") {
    for (q <- Seq("func_jaro_pairs", "func_damerau_pairs",
      "text_compression_ratio")) {
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q has a UDF node")
    }
  }

  test("Q21's opposing quantifiers plan as semi + anti, top-20 as TakeOrdered") {
    val p = plan("tpch_q21").toLowerCase
    assert(p.contains("leftsemi"), p)
    assert(p.contains("leftanti"), p)
    assert(p.contains("takeorderedandproject"), p)
  }

  test("right-outer join plans a real RightOuter (or its flipped build form)") {
    val p = plan("join_right_outer").toLowerCase
    assert(p.contains("rightouter") || p.contains("leftouter"), p)
    assert(!p.contains("cartesianproduct"), p)
  }

  test("Q2's correlated MIN decorrelates: agg + equi joins, no re-scan loop") {
    val p = plan("tpch_q2")
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("Q16's NOT IN plans as LeftAnti; Q20's chain stays semi-joins") {
    val p16 = plan("tpch_q16").toLowerCase
    assert(p16.contains("leftanti"), p16.take(1500))
    val p20 = plan("tpch_q20").toLowerCase
    assert(p20.contains("leftsemi"), p20.take(1500))
    assert(!p20.contains("cartesianproduct"), p20.take(1500))
  }

  test("Q11's global total is a broadcast, never a driver collect seam") {
    // the HAVING threshold joins against a 1-row aggregate: plan must
    // contain a broadcast exchange feeding a join, and no cartesian
    val p = plan("tpch_q11")
    assert(p.contains("BroadcastExchange"), p.take(1500))
  }

  test("two-pass heavy hitters broadcasts its candidate set") {
    val p = plan("text_heavy_guaranteed")
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }
  test("two-scan quantile: broadcast bucket pruning, no data-sized sort") {
    // the target-bucket table must BROADCAST to scan 2 (pruning rows at
    // the probe), the histogram must partial-aggregate below its
    // exchange, and the only range-partitioned (global) sort allowed is
    // the 9-row presentation ORDER BY — a second one would mean the
    // operator degenerated to the sort-the-data form it exists to avoid
    val p = plan("agg_quantile_two_scan")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert("rangepartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("auto-K knn graph: cell-bucketed equi pair join, no cartesian") {
    // the pair stream must come from SortMergeJoin/ShuffledHashJoin on
    // the cell key; the only BNLJ allowed is the 1-row facts broadcast
    // inside the assignment build
    val p = plan("embed_knn_graph_autok")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("KS drift windows run over the grid frame, never raw documents") {
    // both cumulative windows must sit ABOVE a HashAggregate (the
    // value-grid / per-source-cell collapse) — a window whose child
    // scans documents directly would sort the corpus
    val p = plan("stat_ks_drift")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, p.take(1500))
    assert(p.substring(winIdx).contains("HashAggregate"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("containment verifier stays candidate-driven equi joins") {
    val p = plan("dedup_containment")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("Gram covariance is one aggregation pass — no join, no input explode") {
    // the naive formulation needs a posexplode² self-join (4096 rows per
    // vector); the aggregator plan must have NO join at all, and its one
    // Generate node (the 2080-cell output explode) must sit ABOVE the
    // aggregate, never below it on the scan side
    val p = plan("embed_covariance")
    assert(!p.contains("Join"), p.take(1500))
    val gen = p.indexOf("Generate")
    val agg = p.lastIndexOf("Aggregate")
    assert(gen >= 0 && agg > gen,
      s"output explode must be above the aggregate: gen=$gen agg=$agg\n" + p.take(1500))
  }

  test("OLS regression is one partial+final aggregate over a broadcast dim join") {
    val p = plan("stat_ols_brand")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p.take(1500))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
  }

  test("sliding distinct-count runs in a single customer-keyed window pass") {
    val p = plan("window_count_distinct")
    assert("Window".r.findAllIn(p).length == 1, p.take(1500))
    assert(p.toLowerCase.contains("hashpartitioning(o_custkey"), p.take(1500))
  }

  test("bitmap distinct: typed bitmap aggregate under a tiny rollup, no raw-key distinct") {
    // level 1 carries the 4 KB bitmap buffers (Spark 4 plans the binary
    // buffer aggregate as SortAggregate; ObjectHashAggregate would also
    // be fine); level 2 is a plain hash rollup over bucket rows — the
    // plan that shuffles bitmaps, never key occurrences
    val p = plan("agg_bitmap_distinct")
    assert(p.contains("SortAggregate") || p.contains("ObjectHashAggregate"),
      p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(!p.toLowerCase.contains("expand"), p.take(1500)) // not the distinct-rewrite path
  }

  test("Benford audit joins the 9-row expectation spine by broadcast") {
    val p = plan("dq_benford")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("wav resample is a map-only object pipeline — no joins, no windows") {
    val p = plan("media_wav_resample")
    assert(p.contains("MapPartitions"), p.take(1500))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(1500))
  }

  test("RAKE keyphrases never cross documents (doc-keyed everywhere)") {
    val p = plan("text_keyword_rake")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("OPH signatures shuffle one row per doc (partial min under the exchange)") {
    // the 8 bucket-mins must partial-aggregate below the doc_id exchange,
    // so the shuffle carries |docs| rows, not |docs×shingles|
    val p = plan("dedup_minhash_oph")
    val agg = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange")
    assert(agg >= 0 && exch >= 0, p.take(1500))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(1500))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
  }
}
