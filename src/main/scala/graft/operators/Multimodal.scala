package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct.
  *
  * IMAGES decode for real: [[ImageCodec]] wraps the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF readers ship with the JRE — no external media libs
  * needed), so [[decodeImage]], [[resizeImageNearest]] and
  * [[imageGridFeatures]] operate on actual pixels and are hash-checked
  * against a closed-form oracle (q_image_decode). AUDIO decodes for real
  * too: [[AudioCodec]] wraps `javax.sound.sampled` (WAV/PCM readers also
  * ship with every JRE), so [[decodeAudio]] and [[audioWindowFeatures]]
  * operate on actual samples and are hash-checked the same way
  * (q_audio_decode, closed-form sawtooth fixture). Video readers do NOT
  * ship with the JDK, so that codec step stays a clearly-marked
  * DETERMINISTIC STUB ([[MediaCodec.decodeStub]], byte-level container
  * sniff) behind the same batch shape — swapping in a real decoder replaces
  * only that function.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("checksum", LongType, nullable = false)))

  /** STUB codec: byte-level inspection standing in for image/audio decode. */
  object MediaCodec extends Serializable {
    private val Magic: Seq[(Array[Byte], String)] = Seq(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) -> "png",
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte) -> "jpeg",
      Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte) -> "wav",
      Array('I'.toByte, 'D'.toByte, '3'.toByte) -> "mp3")

    /** Deterministic stand-in for a real decode: sniffs container magic and
      * computes a rolling checksum. A real implementation would decode pixels /
      * samples here — batch shape and output schema would not change.
      */
    def decodeStub(bytes: Array[Byte]): Row = {
      if (bytes == null) Row(0L, null, 0L)
      else {
        val fmt = Magic.collectFirst {
          case (magic, name) if bytes.length >= magic.length &&
            magic.indices.forall(i => bytes(i) == magic(i)) => name
        }.orNull
        var h = 0L
        var i = 0
        while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        Row(bytes.length.toLong, fmt, h)
      }
    }
  }

  /** REAL image codec over `javax.imageio` (JDK built-in readers/writers).
    * `getRGB` normalizes every reader's native raster to packed sRGB ints, so
    * channel arithmetic downstream is byte-exact for 8-bit images regardless
    * of which ImageIO reader claimed the payload.
    */
  object ImageCodec extends Serializable {
    javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache on executors

    final case class Decoded(width: Int, height: Int, argb: Array[Int])

    /** None for null/empty/undecodable payloads (ImageIO returns null when no
      * registered reader recognizes the container).
      */
    def decode(bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.isEmpty) None
      else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          val w = img.getWidth; val h = img.getHeight
          val px = new Array[Int](w * h)
          img.getRGB(0, 0, w, h, px, 0, w)
          Decoded(w, h, px)
        }
    }

    /** Lossless PNG encode of packed-RGB pixels produced by `rgb(x, y)`. */
    def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", out), "no PNG writer registered")
      out.toByteArray
    }

    /** Nearest-neighbor resample: target pixel (x, y) reads source pixel
      * (x*w/w2, y*h/h2) (integer division) — deterministic across JVMs,
      * unlike the platform-dependent smooth-scaling filters.
      */
    def resizeNearest(d: Decoded, w2: Int, h2: Int): Decoded = {
      val out = new Array[Int](w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = y * d.height / h2
        var x = 0
        while (x < w2) { out(y * w2 + x) = d.argb(sy * d.width + x * d.width / w2); x += 1 }
        y += 1
      }
      Decoded(w2, h2, out)
    }
  }

  /** REAL audio codec over `javax.sound.sampled` (JDK built-in WAV/AU/AIFF
    * readers — PCM WAV is in every JRE). Samples are normalized to signed
    * Ints (16-bit as-is, 8-bit unsigned recentered by −128), interleaved
    * across channels in frame order, so sample arithmetic downstream is
    * integer-exact regardless of the container's byte order.
    */
  object AudioCodec extends Serializable {
    import javax.sound.sampled._

    final case class Decoded(
        sampleRate: Int, channels: Int, frames: Long, samples: Array[Int])

    /** None for null/empty/non-audio payloads and for encodings other than
      * integer PCM (the JRE can report ULAW/ALAW/float frames; supporting
      * exactly 8/16-bit PCM keeps every returned sample bit-faithful).
      */
    def decode(bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          val ok = (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
            f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) &&
            (f.getSampleSizeInBits == 16 || f.getSampleSizeInBits == 8)
          if (!ok) None
          else {
            val raw = ais.readAllBytes()
            val bytesPerSample = f.getSampleSizeInBits / 8
            val n = raw.length / bytesPerSample
            val out = new Array[Int](n)
            var i = 0
            if (bytesPerSample == 1) {
              val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
              while (i < n) {
                out(i) = if (unsigned) (raw(i) & 0xff) - 128 else raw(i).toInt
                i += 1
              }
            } else {
              val big = f.isBigEndian
              while (i < n) {
                val b0 = raw(2 * i); val b1 = raw(2 * i + 1)
                out(i) = if (big) (b0 << 8) | (b1 & 0xff) else (b1 << 8) | (b0 & 0xff)
                i += 1
              }
            }
            Some(Decoded(f.getSampleRate.round, f.getChannels,
              n.toLong / f.getChannels, out))
          }
        } finally ais.close()
      } catch { case _: UnsupportedAudioFileException | _: java.io.IOException => None }
    }

    /** Lossless 16-bit signed little-endian PCM mono WAV of `sample(i)`
      * values (callers must keep them in [-32768, 32767]).
      */
    def encodeWav(sampleRate: Int, n: Int, sample: Int => Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(i)
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
      out.toByteArray
    }
  }

  val AudioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_abs", LongType, nullable = false)))

  /** Decode a binary audio column for real and append
    * `(sample_rate, channels, n_frames, peak, sum_abs)` — container facts
    * plus max |sample| and Σ|sample| over all interleaved samples, the
    * properties a closed-form oracle can recompute without an audio library.
    * Null/undecodable payloads get a zero struct (sample_rate = 0 flags
    * them). Whole-partition pass, same shape as [[decodeImage]].
    */
  def decodeAudio(df: DataFrame, binCol: String, outCol: String = "audio_meta"): DataFrame = {
    val outSchema = df.schema.add(outCol, AudioMetaSchema, nullable = false)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val meta = AudioCodec.decode(row.getAs[Array[Byte]](binIdx)) match {
          case None => Row(0, 0, 0L, 0, 0L)
          case Some(d) =>
            var peak = 0; var sumAbs = 0L
            var i = 0
            while (i < d.samples.length) {
              val a = math.abs(d.samples(i))
              if (a > peak) peak = a
              sumAbs += a
              i += 1
            }
            Row(d.sampleRate, d.channels, d.frames, peak, sumAbs)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Real sample features: `n` per-window RMS values over the decoded
    * interleaved samples — the classic audio energy profile, closed-form
    * checkable. Sample i belongs to window `i*n/total` (the [[imageGridFeatures]]
    * cell convention); RMS = sqrt(Σs²/count) — the integer sum is exact and
    * IEEE sqrt is correctly rounded, so any engine reproduces the doubles
    * bit-for-bit. Undecodable payloads yield an all-zero vector so media
    * rows never drop out of downstream similarity joins.
    */
  def audioWindowFeatures(
      df: DataFrame, binCol: String, n: Int,
      outCol: String = "audio_features"): DataFrame = {
    require(n >= 1, s"need a positive window count, got $n")
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false), nullable = false)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val feats = AudioCodec.decode(row.getAs[Array[Byte]](binIdx)) match {
          case None => Array.fill(n)(0.0)
          case Some(d) =>
            val sums = new Array[Long](n)
            val counts = new Array[Long](n)
            val total = d.samples.length
            var i = 0
            while (i < total) {
              val w = (i.toLong * n / total).toInt
              val s = d.samples(i).toLong
              sums(w) += s * s
              counts(w) += 1
              i += 1
            }
            Array.tabulate(n)(w =>
              if (counts(w) == 0) 0.0 else math.sqrt(sums(w).toDouble / counts(w)))
        }
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(enc)
  }

  /** Deterministic synthetic "test tone" WAV per id: sample `i` of clip `id`
    * is the sawtooth `((2469·id + 303·i) mod 65536) − 32768` — integer-exact
    * closed form (no trig, so a SQL oracle recomputes it without float
    * parity concerns), full 16-bit swing, different phase per id. PCM WAV is
    * lossless, so decode must reproduce exactly these values. Fixture
    * generator for the hash-checked audio queries and specs, mirroring
    * [[encodeTestCard]].
    */
  def encodeTestTone(
      df: DataFrame, idCol: String, sampleRate: Int, nSamples: Int,
      outCol: String = "wav"): DataFrame = {
    require(sampleRate > 0 && nSamples > 0,
      s"need positive rate/length, got $sampleRate/$nSamples")
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val wav = AudioCodec.encodeWav(sampleRate, nSamples, i =>
          java.lang.Math.floorMod(2469L * id + 303L * i, 65536L).toInt - 32768)
        Row.fromSeq(row.toSeq :+ wav)
      }
    }(enc)
  }

  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Decode a binary image column for real and append
    * `(width, height, sum_r, sum_g, sum_b)` — dimensions plus per-channel
    * pixel sums, the properties a closed-form oracle can recompute without a
    * decoder. Null/undecodable payloads get a zero struct (width = 0 flags
    * them). Whole-partition pass, same shape as [[withMediaMeta]].
    */
  def decodeImage(df: DataFrame, binCol: String, outCol: String = "image_meta"): DataFrame = {
    val outSchema = df.schema.add(outCol, ImageMetaSchema, nullable = false)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val meta = ImageCodec.decode(row.getAs[Array[Byte]](binIdx)) match {
          case None => Row(0, 0, 0L, 0L, 0L)
          case Some(d) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = 0
            while (i < d.argb.length) {
              val p = d.argb(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            Row(d.width, d.height, sr, sg, sb)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Real resize on decoded pixels: decode → nearest-neighbor resample →
    * lossless PNG re-encode. Undecodable payloads yield null (distinguishable
    * from a decodable empty image, which cannot exist).
    */
  def resizeImageNearest(
      df: DataFrame, binCol: String, w: Int, h: Int,
      outCol: String = "resized"): DataFrame = {
    require(w > 0 && h > 0, s"need positive target dims, got ${w}x$h")
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val resized = ImageCodec.decode(row.getAs[Array[Byte]](binIdx)).map { d =>
          val r = ImageCodec.resizeNearest(d, w, h)
          ImageCodec.encodePng(r.width, r.height, (x, y) => r.argb(y * r.width + x))
        }.orNull
        Row.fromSeq(row.toSeq :+ resized)
      }
    }(enc)
  }

  /** Real pixel features: a `gx`×`gy` grid of mean brightnesses
    * ((r+g+b)/3 averaged over each cell, row-major cells) — the classic tiny
    * image descriptor, closed-form checkable. Pixel (x, y) belongs to cell
    * (x*gx/width, y*gy/height). Undecodable payloads yield an all-zero vector
    * so media rows never drop out of downstream similarity joins.
    */
  def imageGridFeatures(
      df: DataFrame, binCol: String, gx: Int, gy: Int,
      outCol: String = "features"): DataFrame = {
    require(gx >= 1 && gy >= 1, s"need positive grid dims, got ${gx}x$gy")
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false), nullable = false)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val feats = ImageCodec.decode(row.getAs[Array[Byte]](binIdx)) match {
          case None => Array.fill(gx * gy)(0.0)
          case Some(d) =>
            val sums = new Array[Long](gx * gy)
            val counts = new Array[Long](gx * gy)
            var y = 0
            while (y < d.height) {
              val cy = y * gy / d.height
              var x = 0
              while (x < d.width) {
                val p = d.argb(y * d.width + x)
                val cell = cy * gx + x * gx / d.width
                sums(cell) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                counts(cell) += 1
                x += 1
              }
              y += 1
            }
            Array.tabulate(gx * gy)(i => if (counts(i) == 0) 0.0 else sums(i) / (3.0 * counts(i)))
        }
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(enc)
  }

  /** Deterministic synthetic "test card" PNG per id: pixel (x, y) of image
    * `id` has channels `r = (7·id + 3x + 5y) mod 256`,
    * `g = (11·id + x + 2y) mod 256`, `b = (13·id + 4x + y) mod 256`. PNG is
    * lossless, so decode must reproduce exactly these values — which a SQL
    * oracle computes in closed form without any image library. This is the
    * fixture generator for the hash-checked image queries and specs.
    */
  def encodeTestCard(
      df: DataFrame, idCol: String, w: Int, h: Int,
      outCol: String = "img"): DataFrame = {
    require(w > 0 && h > 0, s"need positive dims, got ${w}x$h")
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val png = ImageCodec.encodePng(w, h, { (x, y) =>
          val r = java.lang.Math.floorMod(7 * id + 3 * x + 5 * y, 256L).toInt
          val g = java.lang.Math.floorMod(11 * id + x + 2 * y, 256L).toInt
          val b = java.lang.Math.floorMod(13 * id + 4 * x + y, 256L).toInt
          (r << 16) | (g << 8) | b
        })
        Row.fromSeq(row.toSeq :+ png)
      }
    }(enc)
  }

  /** Attach decoded metadata for a binary media column. Executed as a
    * whole-partition pass (`mapPartitions` via the typed API) so a real codec
    * pays its init cost once per partition, not once per row.
    */
  def withMediaMeta(df: DataFrame, binCol: String, outCol: String = "media_meta"): DataFrame = {
    val outSchema = df.schema.add(outCol, MetaSchema, nullable = false)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec init would go here (model/library handle)
      rows.map { row =>
        val meta = MediaCodec.decodeStub(row.getAs[Array[Byte]](binIdx))
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(enc)
  }

  /** Resize plumbing: binary in → binary out with a `(width, height)` target
    * carried in a sibling struct column. The STUB "resize" deterministically
    * strides the payload down to `w*h` bytes (a real image path decodes,
    * resamples pixels, re-encodes — same signature, same batch shape).
    */
  def resize(df: DataFrame, binCol: String, w: Int, h: Int,
      outCol: String = "resized"): DataFrame = {
    require(w > 0 && h > 0)
    val target = w * h
    val rs = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) Array.empty[Byte]
      else if (bytes.length <= target) bytes
      else {
        val out = new Array[Byte](target)
        val stride = bytes.length.toDouble / target
        var i = 0
        while (i < target) { out(i) = bytes((i * stride).toInt); i += 1 }
        out
      }
    }
    df.withColumn(outCol, rs(col(binCol)))
      .withColumn(s"${outCol}_shape", struct(lit(w).as("width"), lit(h).as("height")))
  }

  /** Feature extraction: binary payload → unit-norm `array<double>` embedding.
    * The STUB projects the bytes through the same seeded hash-projection used
    * for text (HashEmbedder kernel over a hex digest), so media columns plug
    * directly into the engine's similarity/dedup/ANN operators today; a real
    * model (CLIP-style encoder) replaces only the per-partition kernel.
    */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 64,
      outCol: String = "features"): DataFrame = {
    require(dim >= 1)
    val fx = udf { (bytes: Array[Byte]) =>
      val s = if (bytes == null) "" else {
        // stable textual digest of the payload (first/last bytes + length)
        val head = bytes.take(32).map(b => (b & 0xff).toHexString).mkString
        val tail = bytes.takeRight(8).map(b => (b & 0xff).toHexString).mkString
        s"$head:$tail:${bytes.length}"
      }
      graft.embed.HashEmbedder.embedText(s, dim, tokenMix = false)
    }
    df.withColumn(outCol, fx(col(binCol)))
  }

  /** Deterministic frame/chunk sampling: split the payload into `n` evenly
    * spaced fixed-size chunks (a real video path would seek keyframes; the
    * partitioning/UDF shape is identical).
    */
  def sampleChunks(df: DataFrame, binCol: String, n: Int, chunkBytes: Int = 64,
      outCol: String = "chunks"): DataFrame = {
    require(n > 0 && chunkBytes > 0)
    val sample = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) Array.empty[Array[Byte]]
      else {
        val stride = math.max(1, bytes.length / n)
        (0 until n).flatMap { i =>
          val off = i * stride
          if (off < bytes.length) Some(bytes.slice(off, math.min(off + chunkBytes, bytes.length)))
          else None
        }.toArray
      }
    }
    df.withColumn(outCol, sample(col(binCol)))
  }
}
