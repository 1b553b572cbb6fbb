package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image-ish payload with enough bytes to slice into frames"),
    (1L, "an audio-ish payload that is also just deterministic bytes"),
    (2L, "a video-ish payload for the frame sampling operator test")).toDF("doc_id", "text")

  test("syntheticMedia conforms to the media schema with typed metadata") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "kind", "bytes", "meta"))
    val meta = m.select("meta.width", "meta.height", "meta.n_bytes")
      .as[(Int, Int, Long)].collect()
    assert(meta.forall { case (w, h, n) => w > 0 && h > 0 && n > 0 })
    val kinds = m.select("kind").as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("extractFeatures yields fixed-dim float vectors, deterministically") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(m, dim = 16)
    assert(f1.select(size($"features")).as[Int].collect().forall(_ === 16))
    val a = f1.select("media_id", "features").as[(Long, Array[Float])]
      .collect().toMap
    val b = Multimodal.extractFeatures(m, dim = 16)
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(v.toSeq === b(k).toSeq) }
  }

  test("extractFeatures features feed directly into ANN search") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(m, dim = 8)
    val topk = graft.similarity.Ann.bruteForceTopK(
      feats, "media_id", "features", feats.limit(1), "media_id", "features", k = 2)
    assert(topk.count() === 2)
  }

  test("readBinaryFiles ingests real files into the media schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bin")
    java.nio.file.Files.write(tmp.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(tmp.resolve("b.wav"), Array[Byte](5, 6))
    java.nio.file.Files.write(tmp.resolve("c.bin"), Array[Byte](7))
    val m = Multimodal.readBinaryFiles(spark, tmp.toString)
    assert(m.count() === 3)
    val kinds = m.select("kind").as[String].collect().sorted.toSeq
    assert(kinds === Seq("audio", "binary", "image"))
    assert(m.select("meta.n_bytes").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L))
    // ingested rows flow into the downstream operators unchanged
    val feats = Multimodal.extractFeatures(m, dim = 4)
    assert(feats.select(size($"features")).as[Int].collect().forall(_ === 4))
  }

  test("custom MediaDecoder plugs in with per-partition open()") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    // a decoder whose context proves open() ran: features = [n_bytes, ctx]
    object CountingDecoder extends Multimodal.MediaDecoder {
      override def open(): AnyRef = java.lang.Double.valueOf(7.0)
      override def decode(ctx: AnyRef, kind: String, bytes: Array[Byte],
          dim: Int): Array[Float] =
        Array(bytes.length.toFloat, ctx.asInstanceOf[java.lang.Double].floatValue)
    }
    val feats = Multimodal.extractFeatures(m, dim = 2, decoder = CountingDecoder)
    val rows = feats.select($"features").as[Seq[Float]].collect()
    assert(rows.nonEmpty && rows.forall(f => f.length === 2 && f(1) === 7.0f))
  }

  test("ImageIoDecoder decodes a real PNG to pixel-derived features") {
    def solidPng(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val dim = 16
    val white = Multimodal.ImageIoDecoder.decode(null, "image", solidPng(0xffffff), dim)
    val black = Multimodal.ImageIoDecoder.decode(null, "image", solidPng(0x000000), dim)
    // luminance histograms: all mass in the top / bottom bin
    assert(white(dim - 1) === 1.0f && white.sum === 1.0f)
    assert(black(0) === 1.0f && black.sum === 1.0f)
    // non-PNG bytes and non-image kinds fall back to the hash stub
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.ImageIoDecoder.decode(null, "image", junk, dim).toSeq ===
      Multimodal.fakeDecode(junk, dim).toSeq)
    assert(Multimodal.ImageIoDecoder.decode(null, "audio", junk, dim).toSeq ===
      Multimodal.fakeDecode(junk, dim).toSeq)
  }

  test("withRealImages routes image rows through the real codec end-to-end") {
    val m = Multimodal.withRealImages(
      Multimodal.syntheticMedia(docs, "doc_id", "text"))
    // payloads are genuine PNGs: ImageIO parses them
    val pngOk = m.filter($"kind" === "image").select("bytes").as[Array[Byte]]
      .collect().forall { b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)) != null
      }
    assert(pngOk)
    val feats = Multimodal.extractFeatures(m, dim = 16)
      .select("media_id", "kind", "features")
      .as[(Long, String, Array[Float])].collect()
    val img = feats.filter(_._2 == "image")
    assert(img.nonEmpty)
    img.foreach { case (id, _, f) =>
      // pixel-derived: a normalized histogram (sums to ~1), NOT the
      // unbounded hash-stub values
      assert(math.abs(f.sum - 1.0f) < 1e-3, s"media $id not a histogram: ${f.toSeq}")
      assert(f.forall(v => v >= 0.0f && v <= 1.0f))
    }
    // deterministic across invocations
    val again = Multimodal.extractFeatures(m, dim = 16)
      .select("media_id", "features").as[(Long, Array[Float])].collect().toMap
    feats.foreach { case (id, _, f) => assert(f.toSeq === again(id).toSeq) }
  }

  test("resizeDims preserves aspect ratio and never upscales") {
    val m = Seq(
      (1L, "image", Array[Byte](1), (2000, 1000, 0, 0L, 1L)),
      (2L, "image", Array[Byte](1), (100, 50, 0, 0L, 1L)),
      (3L, "audio", Array[Byte](1), (0, 0, 16000, 10L, 1L)))
      .toDF("media_id", "kind", "bytes", "meta")
      .withColumn("meta", $"meta".cast(
        "struct<width:int,height:int,sample_rate:int,duration_ms:bigint,n_bytes:bigint>"))
    val r = Multimodal.resizeDims(m, maxDim = 512)
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    // 2000x1000 -> 512x256 (downscale, aspect kept); 100x50 untouched;
    // audio row filtered out
    assert(r === Seq((1L, 2000, 1000, 512, 256), (2L, 100, 50, 100, 50)))
  }

  test("sampleFrames splits payload into n ordered binary frames") {
    val m = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, n = 4)
    assert(frames.columns.toSeq === Seq("media_id", "kind", "frame_no", "frame_bytes"))
    val perDoc = frames.groupBy("media_id").count()
      .select("count").as[Long].collect()
    assert(perDoc.forall(_ === 4))
    assert(frames.select(max($"frame_no")).as[Int].head() === 3)
  }

  test("parseWavPcm16 roundtrips wavBytes; decoder computes the exact RMS envelope") {
    // constant full-half-scale signal: every sample 16384 → RMS 0.5
    val n = 1000
    val flat = {
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
      (0 until n).foreach(_ => bb.putShort(16384))
      bb.array()
    }
    val s = Multimodal.parseWavPcm16(flat)
    assert(s.length === n && s.forall(_ === 16384))
    val f = Multimodal.WavPcmDecoder.decode(null, "audio", flat, 8)
    assert(f.length === 8)
    f.foreach(v => assert(math.abs(v - 0.5f) < 1e-4f, s"rms $v"))
    // generated fixture parses to its sample count and bounded features
    val wav = Multimodal.wavBytes(seed = 7L, nSamples = 800)
    assert(Multimodal.parseWavPcm16(wav).length === 800)
    val g = Multimodal.WavPcmDecoder.decode(null, "audio", wav, 8)
    assert(g.forall(v => v >= 0f && v <= 1f) && g.exists(_ > 0.05f))
  }

  test("parseWavPcm16 mono-mixes stereo and rejects junk safely") {
    // stereo: L=1000, R=3000 → mix 2000
    val n = 10
    val bb = java.nio.ByteBuffer.allocate(44 + n * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 4)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(16000).putInt(64000).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 4)
    (0 until n).foreach { _ => bb.putShort(1000); bb.putShort(3000) }
    val s = Multimodal.parseWavPcm16(bb.array())
    assert(s.length === n && s.forall(_ === 2000))
    // junk, truncation, and float-format WAVs fall back to null (→ stub)
    assert(Multimodal.parseWavPcm16("not a wav at all".getBytes) === null)
    assert(Multimodal.parseWavPcm16(Array[Byte](82, 73)) === null)
    val wav = Multimodal.wavBytes(3L, 100)
    assert(Multimodal.parseWavPcm16(wav.take(50)) === null) // truncated data
    // hostile size field that would overflow an Int bounds check
    val evil = Multimodal.wavBytes(3L, 100)
    val bbEvil = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbEvil.putInt(40, 0x7ffffff0) // data chunk size → near Int.MaxValue
    assert(Multimodal.parseWavPcm16(evil) === null)
    val junkAudio = Multimodal.WavPcmDecoder.decode(null, "audio", "xyz".getBytes, 4)
    assert(junkAudio === Multimodal.fakeDecode("xyz".getBytes, 4))
  }

  test("withRealAudio routes audio rows through the RIFF/PCM codec end-to-end") {
    val media = Multimodal.withRealAudio(Multimodal.withRealImages(
      Multimodal.syntheticMedia(docs, "doc_id", "text")))
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .as[(Long, String, Array[Float])].collect()
    val audio = feats.filter(_._2 == "audio")
    assert(audio.nonEmpty)
    audio.foreach { case (id, _, f) =>
      // pixel/sample-derived features are bounded RMS values, and must
      // equal a direct decode of the same fixture — proving the scan
      // went through the real codec, not the hash stub
      assert(f.forall(v => v >= 0f && v <= 1f))
      val direct = Multimodal.WavPcmDecoder.decode(
        null, "audio", Multimodal.wavBytes(id, 800), 8)
      assert(f.toSeq === direct.toSeq)
    }
  }
}
