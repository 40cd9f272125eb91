package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct. The Spark-side machinery — schema,
  * per-partition batching, partitioning behavior — is real and tested; the
  * actual codec step is a clearly-marked DETERMINISTIC STUB (the decode
  * libraries are not in this container). Swapping in a real decoder means
  * replacing [[MediaCodec.decodeStub]] only — every signature stays put.
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
