package graft.multimodal

import graft.SparkSpec

/** media_channel_stats: the decoded-pixel channel moments must equal an
  * independent local replay of the generation rule over EVERY pixel of
  * every image (the decode side of the gate the oracle checks
  * relationally), and the derived normalization constants must be
  * internally consistent. */
class ChannelStatsSpec extends SparkSpec {

  test("channel moments equal a full local pixel replay; constants consistent") {
    import spark.implicits._
    val got = Media.channelStatsQuery(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Double, Double, Double,
        Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("image/bmp", "image/png"))

    // local replay of the generation rule, every pixel of every doc
    val docs = graft.Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "n_chars").as[(Long, Long)].collect()
    val expect = docs.groupBy { case (id, _) =>
      if (id % 2 == 0) "image/png" else "image/bmp"
    }.map { case (mt, ds) =>
      var np = 0L; var sr = 0L; var sg = 0L; var sb = 0L
      ds.foreach { case (id, nc) =>
        val w = (16 + nc % 64).toInt; val h = (16 + (nc * 7) % 64).toInt
        var i = 0
        while (i < w * h) {
          val p = (id * 2654435761L + i * 40503L) & 0xffffffL
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        np += w.toLong * h
      }
      mt -> (ds.size.toLong, np, sr, sg, sb)
    }
    got.foreach { case (mt, ni, np, sr, sg, sb, mr, mg, mb, vr, vg, vb) =>
      val (eNi, eNp, eSr, eSg, eSb) = expect(mt)
      assert(ni == eNi && np == eNp, s"$mt image/pixel counts")
      assert((sr, sg, sb) == ((eSr, eSg, eSb)), s"$mt channel sums")
      assert(mr == sr.toDouble / np && mg == sg.toDouble / np &&
        mb == sb.toDouble / np, s"$mt means")
      Seq(vr, vg, vb).foreach(v => assert(v >= 0.0 && v <= 255.0 * 255.0 / 4 + 1,
        s"$mt variance range"))
      Seq(mr, mg, mb).foreach(m => assert(m >= 0.0 && m <= 255.0))
    }
  }
}
