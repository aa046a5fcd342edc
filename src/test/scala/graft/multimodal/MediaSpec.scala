package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The media decode contract: a REAL codec round trip (encode PNG/BMP,
  * decode dimensions/format/frames from the bytes alone), typed output
  * schema, and blob-column pruning. */
class MediaSpec extends SparkSpec {

  test("real codec round trip: decoded dims/format/frames match the generation rule") {
    import spark.implicits._
    val decoded = Media.decode(spark, sf0001)
      .select($"doc_id", $"media_type", $"width", $"height", $"n_frames")
    val expected = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id",
        when($"doc_id" % 2 === 0, "image/png").otherwise("image/bmp")
          .as("media_type"),
        (lit(16) + $"n_chars" % 64).cast("int").as("width"),
        (lit(16) + ($"n_chars" * 7) % 64).cast("int").as("height"),
        lit(1).as("n_frames"))
    assert(decoded.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(decoded).count() == 0)
    // both codecs actually exercised
    val types = decoded.select($"media_type").distinct().as[String]
      .collect().sorted.toSeq
    assert(types == Seq("image/bmp", "image/png"))
  }

  test("animated GIF round trip: frame counts come from the container") {
    import spark.implicits._
    // n_chars == UTF-8 byte length in this fixture (ASCII corpus), so
    // the oracle-visible generation rule is recomputable from n_chars
    val decoded = Media.gifDecode(spark, sf0001)
      .select($"doc_id", $"media_type", $"width", $"height", $"n_frames")
    val expected = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id",
        lit("image/gif").as("media_type"),
        (lit(16) + $"n_chars" % 64).cast("int").as("width"),
        (lit(16) + ($"n_chars" * 7) % 64).cast("int").as("height"),
        (lit(1) + $"n_chars" % 24).cast("int").as("n_frames"))
    assert(decoded.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(decoded).count() == 0)
    // multi-frame containers are genuinely present (not all n=1)
    assert(decoded.filter($"n_frames" > 1).count() > 0)
  }

  test("decoder sniffs format from magic bytes, not metadata") {
    import spark.implicits._
    // hand the decoder a payload whose claimed media_type lies: the
    // sniffed format must win
    val png = Media.imageTable(spark, sf0001).filter($"doc_id" % 2 === 0)
      .head()
    val lied = Media.MediaFile(png.doc_id, "image/jpeg", png.content)
    val out = Media.decodeBatch(Iterator(lied)).toSeq
    assert(out.head.media_type == "image/png")
  }

  test("decode output is a typed Dataset with the declared schema") {
    val sch = Media.decode(spark, sf0001).schema
    assert(sch.fieldNames.toSeq == Seq("doc_id", "media_type", "byte_len",
      "width", "height", "n_frames", "fingerprint"))
    assert(sch("byte_len").dataType.typeName == "integer")
  }

  test("scans that don't project the blob never read it (column pruning)") {
    import spark.implicits._
    val plan = Media.mediaTable(spark, sf0001)
      .select($"doc_id", $"media_type")
      .queryExecution.executedPlan.toString
    // ReadSchema should not include the wide text column
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("text"), s"blob column not pruned: $read")
  }

  test("decode adds no shuffle beyond the harness scan fan-out") {
    val plan = Media.decode(spark, sf0001).queryExecution.executedPlan.toString
    // Tables.fanOut contributes one RoundRobin exchange for the
    // single-row-group harness files; the decode stage itself must not
    assert(plan.split("Exchange").length - 1 <= 1, s"unexpected shuffle:\n$plan")
  }

  test("binaryFile source ingests a media directory into binary rows") {
    // the on-disk ingestion path for real media lakes: files → one row
    // per file with (path, length, content BINARY) — the same columnar
    // shape mediaTable derives from the documents fixture, so the whole
    // decode pipeline runs unchanged on directory input
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("binfiles").toFile.getAbsolutePath
    val payloads = Seq("m0" -> "frame-data-0", "m1" -> "fd1", "m2" -> "x" * 100)
    payloads.foreach { case (n, c) =>
      Files.write(Paths.get(s"$dir/$n.bin"), c.getBytes("UTF-8"))
    }
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir)
      .select(
        element_at(split(input_file_name(), "/"), -1).as("f"),
        col("length"), col("content"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("m0.bin", "m1.bin", "m2.bin"))
    payloads.sortBy(_._1).zip(rows).foreach { case ((_, c), (_, len, got)) =>
      assert(len == c.length && got == c)
    }
  }

  test("wav fixtures are genuine RIFF containers the JDK decoder accepts") {
    import spark.implicits._
    val sample = Media.wavTable(spark, sf0001).take(5)
    assert(sample.nonEmpty)
    sample.foreach { m =>
      assert(new String(m.content.take(4), "US-ASCII") == "RIFF")
      assert(new String(m.content.slice(8, 12), "US-ASCII") == "WAVE")
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(m.content))
      assert(aff.getFormat.getChannels == 1)
      assert(aff.getFormat.getSampleSizeInBits == 16)
    }
  }

  test("wav decode recovers the exact synthetic waveform moments") {
    val feats = Media.wavDecode(spark, sf0001).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      // recompute the generation rule locally, sample by sample
      var ssq = 0L; var peak = 0; var i = 0
      while (i < f.n_samples) {
        val s = (((f.doc_id * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt
        ssq += s.toLong * s; val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      assert(f.ssq == ssq, s"doc ${f.doc_id}: ssq ${f.ssq} != $ssq")
      assert(f.peak == peak, s"doc ${f.doc_id}: peak ${f.peak} != $peak")
      assert(f.channels == 1 && f.bits == 16)
    }
  }

  test("a corrupted wav payload fails loudly, not silently") {
    val m = Media.wavTable(spark, sf0001).take(1).head
    val bad = m.content.clone(); bad(0) = 'X'.toByte // break the RIFF magic
    intercept[Exception] {
      Media.wavDecodeBatch(Iterator(m.copy(content = bad))).toList
    }
  }
}
