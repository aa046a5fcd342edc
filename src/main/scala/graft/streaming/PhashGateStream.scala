package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.multimodal.Media
import graft.multimodal.Media.MediaFile

/** Streaming image near-duplicate gate — the multimodal twin of
  * [[NeardupStream]]: as new IMAGES land, each is decoded, block-mean
  * perceptual-hashed, and probed against the accepted lake's phash
  * index BEFORE it can enter the training corpus, with zero
  * stream-side state.
  *
  * The two stateless tricks compose:
  *  - the signature is MAP-ONLY: the same `Media.hashBatch` kernel the
  *    batch `media_phash` query runs (real `javax.imageio` decode →
  *    integer luma block sums → 64-bit hash) applied per micro-batch
  *    partition — bit-identical hashes by construction, no state, no
  *    watermark, plain append mode;
  *  - the lookup is a stream-STATIC equi join per 16-bit Hamming band
  *    (4 joins unioned — never an OR join), then one codegen'd
  *    popcount(xor) ≤ 20 verification per candidate — the exact
  *    banding + verification contract of the batch
  *    `media_phash_clusters` operator.
  *
  * At 100 TB the phash index is the same maintained artifact story as
  * the ANN index (`sources/Incremental` + `AnnServeStream`): the lake
  * side re-hashes only new partitions, the gate probes whatever index
  * generation is current.
  */
object PhashGateStream {

  /** Static index: band-keyed phashes of the accepted image lake. */
  def buildIndex(lake: Dataset[MediaFile]): DataFrame = {
    import lake.sparkSession.implicits._
    Media.phashBands(
      lake.mapPartitions(Media.hashBatch)
        .select($"doc_id", $"phash_hi", $"phash_lo"))
  }

  /** Probe a (possibly streaming) image frame against the static
    * index: one row per verified near-duplicate (new image, lake
    * image) pair with the exact Hamming distance. Band collisions on
    * multiple bands emit once per band — the downstream sink dedups,
    * keeping the stream side stateless (the [[NeardupStream]]
    * contract). */
  def detect(newImages: Dataset[MediaFile], index: DataFrame): DataFrame = {
    import newImages.sparkSession.implicits._
    val s = Media.phashBands(
      newImages.mapPartitions(Media.hashBatch)
        .select($"doc_id", $"phash_hi", $"phash_lo"))
    val idx = index.select(
      col("doc_id").as("dup_of"),
      col("phash_hi").as("ih"), col("phash_lo").as("il"),
      col("b0").as("i0"), col("b1").as("i1"),
      col("b2").as("i2"), col("b3").as("i3"))
    def hit(band: String, ib: String) =
      s.join(idx, col(band) === col(ib) && col("doc_id") =!= col("dup_of"))
        .withColumn("hamming",
          expr("bit_count(phash_hi ^ ih) + bit_count(phash_lo ^ il)"))
        .filter(col("hamming") <= 20)
        .select(col("doc_id"), col("dup_of"), col("hamming"),
          lit(band).as("band"))
    hit("b0", "i0").unionByName(hit("b1", "i1"))
      .unionByName(hit("b2", "i2")).unionByName(hit("b3", "i3"))
  }
}
