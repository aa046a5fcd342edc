package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.multimodal.Media
import graft.multimodal.Media.MediaFile

/** ROUTED ingest dedup — the piece between `dedup_route_audit`'s
  * verdict and a production ingest loop (round 14; r13 shipped the
  * router, nothing exercised it end-to-end): before a micro-batch
  * stream starts probing the standing index, the gate PRICES the index
  * itself with the exact budget rule of the batch audit and picks the
  * path the audit would order:
  *
  *  - `pairwise_banding` — the healthy-corpus path: the stateless
  *    band-probe gates ([[NeardupStream.detect]] /
  *    [[PhashGateStream.detect]]) exactly as shipped;
  *  - `coarse_contraction` — the hash-degenerate path (the regime that
  *    filled the disk in the r11 ×100 rehearsal): arrivals probe the
  *    DISTINCT-signature / distinct-hash contraction of the index by
  *    FULL-KEY equality, so a family of f identical standing documents
  *    costs one index row and each arrival at most one hit — never a
  *    band bucket explosion. This is the streaming form of the
  *    `media_phash_semdedup` contraction contract.
  *
  * The decision is computed ONCE per stream start from the standing
  * index (a |bands|-row integer aggregate, one driver-sized collect —
  * bounded metadata, not data), the same cadence a production loop
  * re-prices on index republication. Batch/stream bit-identity and
  * route agreement with the registered `dedup_route_audit` query are
  * asserted in RoutedDedupStreamSpec.
  *
  * Scale posture: pricing reads only band keys of the index (the
  * artifact, never the corpus — the round-14 gate discipline); both
  * gate paths are stream-static equi joins, zero stream-side state. */
object RoutedDedupStream {

  /** Route verdicts (the `dedup_route_audit.route` vocabulary). */
  val Pairwise = "pairwise_banding"
  val Coarse = "coarse_contraction"

  /** The exact budget rule of `dedup_route_audit`
    * ([[graft.llm.Dedup.RoutePairBudgetPerKey]] pairs per key) applied
    * to ONE family's (band, v) key frame: predicted candidate pairs
    * Σ_bands Σ_buckets C(|bucket|,2) vs budget·n_keys, all in
    * DECIMAL(38,0) — no float and no long cast ever decides a route
    * (the r14 overflow discipline). */
  def routeOf(bandKeys: DataFrame): String = {
    val budget = graft.llm.Dedup.RoutePairBudgetPerKey
    val row = bandKeys
      .groupBy(col("band"), col("v")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("band"))
      .agg(sum(col("cnt")).as("n_keys"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * (cnt - 1)")).as("cp2"))
      .selectExpr("n_keys",
        "CAST((cp2 - (cp2 % 2)) / 2 AS DECIMAL(38,0)) AS cand_pairs")
      .agg(max(col("n_keys")).as("n_keys"),
        sum(col("cand_pairs")).cast("decimal(38,0)").as("total"))
      .selectExpr("total",
        s"CAST(CAST(n_keys AS DECIMAL(38,0)) * $budget AS DECIMAL(38,0))" +
          " AS pair_budget")
      .collect()(0)
    if (row.getDecimal(0).compareTo(row.getDecimal(1)) <= 0) Pairwise
    else Coarse
  }

  /** (band, v) key frame of a signature index (the `minhashSig` /
    * `sigIndex` schema) — the text family's pricing input. */
  def textBandKeys(index: DataFrame): DataFrame =
    index.selectExpr(
      "stack(2, 'band_a', band_a, 'band_b', band_b) AS (band, v)")

  /** (band, v) key frame of a phash index AFTER identical-hash
    * contraction — the population the image band join actually faces
    * (the `dq_lsh_preflight` media_phash convention). */
  def phashBandKeys(index: DataFrame): DataFrame =
    Media.phashBands(
      index.select(col("phash_hi"), col("phash_lo")).distinct())
      .selectExpr(
        """stack(4, 'b0', CAST(b0 AS STRING), 'b1', CAST(b1 AS STRING),
          |         'b2', CAST(b2 AS STRING), 'b3', CAST(b3 AS STRING))
          |  AS (band, v)""".stripMargin)

  /** Coarse text gate: arrivals match standing documents only on FULL
    * 4-hash signature equality, against the distinct-signature
    * contraction (min-doc representative + family size). Output shape
    * matches [[NeardupStream.detect]] (band = 'exact_sig',
    * est_jaccard = 1 — signature equality is the 4-of-4 estimate).
    * `sigs` picks the signature form: the stateless HOF form (default —
    * the streaming contract) or the codegen'd exploded form a BATCH
    * caller should pass (bit-identical by NeardupStreamSpec; measured
    * ~3× cheaper on a bounded frame). */
  def coarseDetect(newDocs: DataFrame, index: DataFrame,
      sigs: DataFrame => DataFrame = NeardupStream.signatures): DataFrame =
    coarseDetectSigs(sigs(newDocs), index)

  private def coarseDetectSigs(s: DataFrame, index: DataFrame): DataFrame = {
    val reps = index
      .groupBy(col("sig0").as("i0"), col("sig1").as("i1"),
        col("sig2").as("i2"), col("sig3").as("i3"))
      .agg(min(col("doc_id")).as("dup_of"))
    s.join(reps,
      col("sig0") === col("i0") && col("sig1") === col("i1") &&
        col("sig2") === col("i2") && col("sig3") === col("i3") &&
        col("doc_id") =!= col("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        lit(1.0).as("est_jaccard"), lit("exact_sig").as("band"))
  }

  /** Coarse image gate: arrivals are decoded through the SAME
    * [[Media.hashBatch]] kernel, then matched on full 64-bit hash
    * equality against the distinct-hash contraction. Output shape
    * matches [[PhashGateStream.detect]] (hamming = 0 by construction,
    * band = 'exact_hash'). */
  def coarsePhashDetect(newImages: Dataset[MediaFile],
      index: DataFrame): DataFrame = {
    import newImages.sparkSession.implicits._
    val s = newImages.mapPartitions(Media.hashBatch)
      .select($"doc_id", $"phash_hi", $"phash_lo")
    val reps = index
      .groupBy(col("phash_hi").as("ih"), col("phash_lo").as("il"))
      .agg(min(col("doc_id")).as("dup_of"))
    s.join(reps,
      col("phash_hi") === col("ih") && col("phash_lo") === col("il") &&
        col("doc_id") =!= col("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        lit(0).as("hamming"), lit("exact_hash").as("band"))
  }

  /** Price the standing signature index, then gate (possibly
    * streaming) document arrivals down the routed path. Returns the
    * verdict alongside the gated frame so callers can log the route a
    * stream took. `sigs` as in [[coarseDetect]]: streams take the
    * stateless HOF default, batch callers pass the codegen'd form. */
  def textGate(newDocs: DataFrame, index: DataFrame,
      sigs: DataFrame => DataFrame = NeardupStream.signatures)
      : (String, DataFrame) =
    routeOf(textBandKeys(index)) match {
      case Pairwise =>
        Pairwise -> NeardupStream.detectSigs(sigs(newDocs), index)
      case r => r -> coarseDetectSigs(sigs(newDocs), index)
    }

  /** The image twin: price the standing phash index, then gate image
    * arrivals down the routed path. */
  def phashGate(newImages: Dataset[MediaFile],
      index: DataFrame): (String, DataFrame) =
    routeOf(phashBandKeys(index)) match {
      case Pairwise =>
        Pairwise -> PhashGateStream.detect(newImages,
          Media.phashBands(index))
      case r => r -> coarsePhashDetect(newImages, index)
    }
}
