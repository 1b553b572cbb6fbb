package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (BASELINE north-star):
  * image/audio/video payloads as opaque BINARY columns with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * execution, feature arrays sized for downstream ANN — is real and
  * tested. The codec itself is STUBBED with a deterministic fake
  * (`fakeDecode`): this container ships no image/audio libraries, so the
  * byte→pixel step is a pure hash of the payload. Swapping in a real
  * decoder is a one-function change inside `mapPartitions`; nothing
  * about the distributed plan changes.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata, one row per
    * asset. `meta` mirrors what a real ingest records at scan time.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("n_bytes", LongType))))))

  /** Deterministic synthetic media table derived from a documents table
    * (payload = utf8 bytes of the text; kind round-robins by id).
    * Stands in for `spark.read.format("binaryFile")` at test time.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"))
      .withColumn("meta", struct(
        (pmod(col("media_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("media_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (length(col("bytes")) * 20L).cast("long").as("duration_ms"),
        length(col("bytes")).cast("long").as("n_bytes")))

  /** Ingest real files as media rows via Spark's `binaryFile` source
    * (each row: path, modificationTime, length, content). Kind is
    * derived from the extension; ids from a hash of the path
    * (deterministic, cluster-size-independent).
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(col("path").rlike("(?i)\\.(png|jpe?g|gif|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|avi|mkv|webm)$"), "video")
          .otherwise("binary").as("kind"),
        col("content").as("bytes"))
      .withColumn("meta", struct(
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate"), lit(0L).as("duration_ms"),
        length(col("bytes")).cast("long").as("n_bytes")))

  /** The pluggable codec boundary: everything Spark-side (partitioning,
    * batch shape, schema) is fixed; productionizing = shipping a real
    * implementation of this ONE interface (JNI/ONNX/javacv — whatever
    * the deployment has). `open()` runs once per partition so codec and
    * model state amortize across the partition's rows, mirroring a
    * Pandas-UDF's per-batch init.
    */
  trait MediaDecoder extends Serializable {
    /** Called once per partition before any decode; returns a
      * per-partition context passed to every decode call (codec
      * handles, model session, scratch buffers).
      */
    def open(): AnyRef = null
    def decode(ctx: AnyRef, kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decoder: payload bytes → `dim` float features via a rolling
    * polynomial hash per band. Deterministic, partition-parallel, and
    * shaped exactly like a real embedding extractor's output
    * (`ARRAY<FLOAT>` of fixed dim). Kept as the fallback for kinds with
    * no codec in this container (audio/video).
    */
  object HashStubDecoder extends MediaDecoder {
    override def decode(ctx: AnyRef, kind: String, bytes: Array[Byte],
        dim: Int): Array[Float] = fakeDecode(bytes, dim)
  }

  /** REAL image decoder via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
    * — no external dependency): image payloads decode to pixels and
    * featurize as a luminance histogram over `dim` bins, normalized by
    * pixel count — deterministic, resolution-robust, and directly
    * usable by the ANN/near-dup operators downstream. Non-image kinds
    * (and image bytes no ImageIO reader accepts) fall back to the hash
    * stub, so a mixed corpus never throws mid-scan.
    *
    * `open()` returns a reusable scratch context; ImageIO reader lookup
    * is per-call but JDK-cached. The decode runs inside the same
    * `mapPartitions` batch loop as the stub — nothing about the
    * distributed plan changes with the codec.
    */
  object ImageIoDecoder extends MediaDecoder {
    override def decode(ctx: AnyRef, kind: String, bytes: Array[Byte],
        dim: Int): Array[Float] = {
      if (kind != "image") return fakeDecode(bytes, dim)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) return fakeDecode(bytes, dim) // not a decodable image
      val out = new Array[Float](dim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // ITU-R BT.601 integer luma from the sRGB channels
          val lum = (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          out(lum * dim / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < dim) { out(i) /= n; i += 1 }
      out
    }
  }

  /** REAL audio decoder for RIFF/WAVE PCM-16 — pure JVM header + sample
    * parsing, no codec library required. Features: RMS energy envelope
    * over `dim` equal windows of the mono-mixed sample stream (each in
    * [0,1] of full scale) — the standard cheap audio fingerprint, and
    * the same fixed-dim `ARRAY<FLOAT>` contract the ANN/near-dup
    * operators consume. Audio bytes that are not PCM-16 WAV (mp3/flac
    * need codec libs this container lacks) fall back to the hash stub,
    * so a mixed corpus never throws mid-scan; non-audio kinds also
    * stub.
    */
  object WavPcmDecoder extends MediaDecoder {
    override def decode(ctx: AnyRef, kind: String, bytes: Array[Byte],
        dim: Int): Array[Float] = {
      if (kind != "audio") return fakeDecode(bytes, dim)
      val samples = parseWavPcm16(bytes)
      if (samples == null || samples.isEmpty) return fakeDecode(bytes, dim)
      val out = new Array[Float](dim)
      val n = samples.length
      var w = 0
      while (w < dim) {
        val lo = (w.toLong * n / dim).toInt
        val hi = ((w + 1).toLong * n / dim).toInt
        var acc = 0.0
        var i = lo
        while (i < hi) {
          val s = samples(i) / 32768.0
          acc += s * s
          i += 1
        }
        out(w) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0.0f
        w += 1
      }
      out
    }
  }

  /** Minimal RIFF/WAVE chunk walk: accepts PCM (format 1), 16 bits per
    * sample; returns the mono mix (channel average) or null when the
    * payload is not such a WAV. Bounds-checked throughout — truncated
    * or hostile payloads return null rather than throw (a corpus scan
    * must never die on one bad asset).
    */
  def parseWavPcm16(b: Array[Byte]): Array[Short] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var pos = 12
    var channels = 0
    var ok = false
    var samples: Array[Short] = null
    while (pos + 8 <= b.length) {
      val id = tag(pos)
      val size = le32(pos + 4)
      // Long math: a hostile 32-bit size would overflow `pos + 8 + size`
      // into a negative Int, defeating the bounds check and driving an
      // OOB read / absurd allocation below
      if (size < 0 || pos.toLong + 8 + size > b.length) return samples // truncated
      if (id == "fmt " && size >= 16) {
        ok = le16(pos + 8) == 1 && le16(pos + 22) == 16 // PCM, 16-bit
        channels = le16(pos + 10)
      } else if (id == "data" && ok && channels > 0) {
        val nFrames = size / (2 * channels)
        val out = new Array[Short](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0
          var c = 0
          while (c < channels) {
            // sign-extend the LE16 sample
            acc += le16(pos + 8 + (f * channels + c) * 2).toShort
            c += 1
          }
          out(f) = (acc / channels).toShort
          f += 1
        }
        samples = out
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    samples
  }

  /** Deterministic real WAV fixture: `nSamples` of a seeded LCG-noise +
    * sine mix at `amplitude` (0..1 full scale), PCM-16 mono. Exercises
    * the [[WavPcmDecoder]] byte→sample path with no fixture files.
    */
  def wavBytes(seed: Long, nSamples: Int, sampleRate: Int = 16000,
      amplitude: Double = 0.5): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = seed
    var i = 0
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val noise = ((s >>> 40) & 0xffff).toInt / 65535.0 - 0.5
      val tone = math.sin(2 * math.Pi * 440.0 * i / sampleRate)
      bb.putShort((amplitude * 32767.0 * (0.7 * tone + 0.6 * noise)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Default production decoder: real ImageIO decode for images, real
    * RIFF/PCM decode for WAV audio, hash stub for everything a bare
    * JVM cannot decode (video and compressed audio need codec
    * libraries). One dispatch per row inside the shared
    * `mapPartitions` batch loop.
    */
  object StandardDecoder extends MediaDecoder {
    override def decode(ctx: AnyRef, kind: String, bytes: Array[Byte],
        dim: Int): Array[Float] = kind match {
      case "image" => ImageIoDecoder.decode(ctx, kind, bytes, dim)
      case "audio" => WavPcmDecoder.decode(ctx, kind, bytes, dim)
      case _ => fakeDecode(bytes, dim)
    }
  }

  def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dim) += (h % 1000L).toFloat / 1000.0f
      i += 1
    }
    out
  }

  /** Feature extraction over the media table: typed `mapPartitions` — the
    * Scala analog of a Pandas-UDF batch loop: one iterator per partition,
    * decoder state opened ONCE per partition, no per-row JNI churn.
    */
  def extractFeatures(media: DataFrame, dim: Int,
      decoder: MediaDecoder = StandardDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String, Array[Byte])] = media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
    ds.mapPartitions { it =>
      val ctx = decoder.open()
      it.map { case (id, kind, bytes) =>
        (id, kind, decoder.decode(ctx, kind, bytes, dim))
      }
    }.toDF("media_id", "kind", "features")
  }

  /** Deterministic real PNG: `w`×`h` RGB pixels from an LCG stream
    * seeded by `seed`, encoded by the JDK's PNG writer. Used to
    * exercise the [[ImageIoDecoder]] byte→pixel path end-to-end with
    * no external fixture files.
    */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 24) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Replace image-kind payloads with REAL PNG bytes (deterministic
    * pixels seeded by media_id; meta width/height updated to match) so
    * the ImageIO decode path runs end-to-end at test time. Fixture
    * generator — production corpora arrive with real payloads via
    * [[readBinaryFiles]]; the per-row UDF here is generation cost, not
    * operator cost.
    */
  def withRealImages(media: DataFrame, w: Int = 16, h: Int = 16): DataFrame = {
    val png = udf((id: Long) => pngBytes(id, w, h))
    media
      .withColumn("bytes",
        when(col("kind") === "image", png(col("media_id")))
          .otherwise(col("bytes")))
      .withColumn("meta",
        when(col("kind") === "image", struct(
          lit(w).as("width"), lit(h).as("height"),
          col("meta.sample_rate"), col("meta.duration_ms"),
          (lit(w) * lit(h) * 3L).as("n_bytes")))
          .otherwise(col("meta")))
  }

  /** Replace audio-kind payloads with REAL PCM-16 WAV bytes
    * (deterministic samples seeded by media_id, ~50ms at 16 kHz;
    * meta sample_rate/duration updated to match) so the RIFF/PCM
    * decode path runs end-to-end at test time — the audio analog of
    * [[withRealImages]].
    */
  def withRealAudio(media: DataFrame, nSamples: Int = 800,
      sampleRate: Int = 16000): DataFrame = {
    val wav = udf((id: Long) => wavBytes(id, nSamples, sampleRate))
    media
      .withColumn("bytes",
        when(col("kind") === "audio", wav(col("media_id")))
          .otherwise(col("bytes")))
      .withColumn("meta",
        when(col("kind") === "audio", struct(
          col("meta.width"), col("meta.height"),
          lit(sampleRate).as("sample_rate"),
          lit(nSamples * 1000L / sampleRate).as("duration_ms"),
          lit(44L + nSamples * 2).as("n_bytes")))
          .otherwise(col("meta")))
  }

  /** Image resize planning: target dimensions under `maxDim` preserving
    * aspect ratio, downscale-only (scale = min(1, maxDim/max(w,h))).
    * Pure metadata expressions — the pixel resample itself is codec
    * work and belongs inside a [[MediaDecoder]]; this computes the
    * exact shape contract (what a `mapInPandas` resize batch would
    * receive) so downstream layout/batching logic is testable without
    * any codec.
    */
  def resizeDims(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    media.filter(col("kind") === "image")
      .withColumn("resized_w", round(w * scale).cast("int"))
      .withColumn("resized_h", round(h * scale).cast("int"))
      .select(col("media_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("resized_w"), col("resized_h"))
  }

  /** Overlapping analysis windows over audio payloads (hop < window ⇒
    * overlap — the STFT framing shape). Windows start at offsets
    * 0, hop, 2·hop, … while offset < payload length; the final window
    * may be partial (`win_len = min(window, L - offset)`). Pure
    * expression, partition-parallel, no shuffle.
    */
  def audioWindows(media: DataFrame, windowBytes: Int, hopBytes: Int): DataFrame = {
    require(windowBytes > 0 && hopBytes > 0, "window and hop must be positive")
    val L = length(col("bytes"))
    // ceil(L / hop) as exact integer math (values ≪ 2^53, so the
    // double division is exact enough for floor to be correct)
    val nWins = floor((L + lit(hopBytes - 1)) / lit(hopBytes)).cast("int")
    media.filter(col("kind") === "audio")
      .filter(L > 0)
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nWins - 1),
          i => col("bytes").substr(i * hopBytes + lit(1), lit(windowBytes))))
          .as(Seq("win_no", "win_bytes")))
      .withColumn("offset", col("win_no") * hopBytes)
      .withColumn("win_len", length(col("win_bytes")))
  }

  /** Frame sampling: split the payload into `n` evenly-sized binary
    * frames (video keyframe extraction shape). Pure expression.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val frameLen = (length(col("bytes")) / n).cast("int")
    media.select(col("media_id"), col("kind"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => col("bytes").substr(i * frameLen + lit(1), frameLen)))
        .as(Seq("frame_no", "frame_bytes")))
      .filter(length(col("frame_bytes")) > 0)
  }
}
