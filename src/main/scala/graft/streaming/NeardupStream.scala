package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate detection against a static LSH index — the
  * ingestion-time curation gate: as new documents land, each is checked
  * against the historical corpus WITHOUT any stream-side state.
  *
  * Two properties make this scale:
  *  - signatures compute MAP-ONLY on the stream via array higher-order
  *    functions (`array_min(transform(...))`) — no explode/groupBy, so
  *    no streaming aggregation state, no watermark, plain append mode.
  *    (The batch path `llm/Dedup.minhashSig` deliberately uses the
  *    exploded+partial-min form instead — codegen'd md5 beats
  *    interpreted HOFs on a full-corpus pass; on a stream the
  *    stateless form wins because state is the scarce resource.
  *    Both forms produce BIT-IDENTICAL signatures — same salted md5
  *    bytes, same lexicographic min — asserted in NeardupStreamSpec.)
  *  - the lookup is a stream-STATIC equi join per LSH band (one join
  *    per band, unioned — never an OR join): stateless by construction,
  *    and the static side is an ordinary table Spark can broadcast or
  *    bucket. At 100 TB the index sits partitioned by band key and
  *    each micro-batch probes only matching buckets.
  *
  * Reference anchor: the same silver-stream shape as
  * `streaming/SilverStream` (ipynb:1171-1244), with the LLM-curation
  * index probe in place of the flat cast chain.
  */
object NeardupStream {

  /** Map-only MinHash signature + band keys, bit-identical to
    * `llm/Dedup.minhashSig` (4 salted md5 min-hashes, 2 bands of 2). */
  def signatures(docs: DataFrame): DataFrame = {
    def h(j: Int) =
      s"array_min(transform(shingles, s -> md5(cast(concat('$j:', s) as binary))))"
    docs
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        """transform(sequence(0, size(tokens) - 3),
          |          i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))""".stripMargin))
      .select(col("doc_id"),
        expr(h(0)).as("sig0"), expr(h(1)).as("sig1"),
        expr(h(2)).as("sig2"), expr(h(3)).as("sig3"))
      .withColumn("band_a", md5(concat(col("sig0"), col("sig1")).cast("binary")))
      .withColumn("band_b", md5(concat(col("sig2"), col("sig3")).cast("binary")))
  }

  /** Probe a (possibly streaming) doc frame against a static signature
    * index (schema of `Dedup.minhashSig`): emits one row per
    * (new doc, historical doc) band collision with the 4-hash Jaccard
    * estimate. Collisions on both bands emit once per band — the
    * downstream sink dedups (keeping the stream side stateless). */
  def detect(newDocs: DataFrame, index: DataFrame): DataFrame =
    detectSigs(signatures(newDocs), index)

  /** [[detect]] with the probe-side SIGNATURE frame precomputed — lets
    * a batch caller supply the codegen'd exploded signature form
    * (bit-identical; the HOF form exists for streams where state is
    * the scarce resource, not because it is fast). */
  def detectSigs(s: DataFrame, index: DataFrame): DataFrame = {
    val idx = index.select(
      col("doc_id").as("dup_of"),
      col("sig0").as("i0"), col("sig1").as("i1"),
      col("sig2").as("i2"), col("sig3").as("i3"),
      col("band_a").as("iba"), col("band_b").as("ibb"))
    val est = ((col("sig0") === col("i0")).cast("int") +
      (col("sig1") === col("i1")).cast("int") +
      (col("sig2") === col("i2")).cast("int") +
      (col("sig3") === col("i3")).cast("int")) / lit(4).cast("double")
    def hit(band: String, ib: String) =
      s.join(idx, col(band) === col(ib) && col("doc_id") =!= col("dup_of"))
        .select(col("doc_id"), col("dup_of"), est.as("est_jaccard"),
          lit(band).as("band"))
    hit("band_a", "iba").unionByName(hit("band_b", "ibb"))
  }
}
