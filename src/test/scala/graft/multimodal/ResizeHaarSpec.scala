package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-8 media transforms: the nearest-neighbor resize loop
  * (decode → sample → re-encode PNG → re-decode → features) and the
  * integer Haar subband energies — both checked against independent
  * in-test recomputations, not just the DuckDB oracle. */
class ResizeHaarSpec extends SparkSpec {

  test("media_resize: re-decoded thumbnail features match a direct NN sample of the source pixels") {
    import spark.implicits._
    val got = Media.resizeQuery(spark, sf0001)
      .select($"doc_id", $"out_w", $"out_h", $"luma_sum", $"luma_peak", $"checksum")
      .as[(Long, Int, Int, Long, Int, Long)].collect().toSeq
    assert(got.nonEmpty && got.forall { case (_, w, h, _, _, _) => w == 13 && h == 9 })
    // independent recompute: decode the ORIGINAL image in the test and
    // sample the same NN coordinates (no PNG re-encode hop) — the hop
    // must be lossless, so the features agree exactly
    val originals = Media.imageTable(spark, sf0001).collect()
      .map(m => m.doc_id -> m.content).toMap
    got.take(25).foreach { case (id, _, _, lsum, lpeak, chk) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(originals(id)))
      var s = 0L; var p = 0; var c = 0L
      for (y <- 0 until 9; x <- 0 until 13) {
        val rgb = img.getRGB(x * img.getWidth / 13, y * img.getHeight / 9) & 0xffffff
        val l = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
        s += l; if (l > p) p = l; c += l.toLong * (1L + x + 13L * y)
      }
      assert((s, p, c) == ((lsum, lpeak, chk)), s"doc $id")
    }
  }

  test("media_wav_haar: subband energies reconstruct from the generation rule; a8 is the block sum") {
    import spark.implicits._
    val got = Media.wavHaarQuery(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    got.take(25).foreach { case (id, e1, e2, e3, e4, e5, e6, e7, e8, a8) =>
      // resynthesize the first 256 samples straight from the fixture rule
      var cur = Array.tabulate(256)(i =>
        ((id * 2654435761L + i * 40503L) % 65536L) - 32768L)
      val want = new Array[Long](8)
      for (lvl <- 0 until 8) {
        val half = cur.length / 2
        val nxt = new Array[Long](half)
        var en = 0L
        for (j <- 0 until half) {
          val d = cur(2 * j) - cur(2 * j + 1)
          nxt(j) = cur(2 * j) + cur(2 * j + 1)
          en += d * d
        }
        want(lvl) = en; cur = nxt
      }
      assert(Seq(e1, e2, e3, e4, e5, e6, e7, e8) == want.toSeq, s"doc $id")
      assert(a8 == cur(0), s"doc $id a8")
      // unnormalized-Haar Parseval: sum over levels of e_k/2^k plus
      // a8^2/256 equals the raw signal energy — the transform loses nothing
      val raw = Array.tabulate(256)(i =>
        ((id * 2654435761L + i * 40503L) % 65536L) - 32768L)
      val rawEnergy = raw.map(v => v * v).sum
      val recon = (0 until 8).map(k => want(k).toDouble / (1L << (k + 1))).sum +
        a8.toDouble * a8 / 256.0
      assert(math.abs(recon - rawEnergy) < 1e-6 * rawEnergy + 1e-6, s"doc $id parseval")
    }
  }

  test("media_resize and media_wav_haar plans are map-only before the output sort") {
    val r = Media.resizeQuery(spark, sf0001).queryExecution.executedPlan.toString
    val h = Media.wavHaarQuery(spark, sf0001).queryExecution.executedPlan.toString
    // one exchange each (the deterministic output ordering); no joins/aggs
    Seq(r, h).foreach { plan =>
      assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
        "decode feature extraction must not shuffle for joins/aggs")
    }
  }
}
