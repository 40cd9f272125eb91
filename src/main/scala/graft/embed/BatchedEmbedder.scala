package graft.embed

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField}

/** Partition-batched embedder — the "model-shaped" provider contract: texts are
  * embedded in executor-side batches (default 128, reference: infer.py:33,
  * utils.py:180-202) via `mapPartitions`, with any heavy per-executor state
  * (an ONNX session, an HTTP client) created lazily inside the partition
  * function — once per executor, not per row (reference loads the model once
  * across blocks, CHANGELOG.md:71-72).
  */
abstract class BatchedEmbedder(val batchSize: Int = 128) extends Embedder {

  /** Model-shaped embeddings cost real work per text → dedup before embedding. */
  override def preferDedup: Boolean = true

  /** Embed one batch of texts (executor-side; never null elements — nulls
    * arrive as "").
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Double]]

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(DoubleType), nullable = false))
    val idx = df.schema.fieldNames.indexOf(textCol)
    require(idx >= 0, s"column $textCol not found")
    val bs = batchSize
    val self = this
    // typed mapPartitions (single serialization fence), not df.rdd
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { rows =>
        val texts = rows.map(r => Option(r.getString(idx)).getOrElse(""))
        val vecs = self.embedBatch(texts)
        require(vecs.length == rows.length,
          s"embedBatch returned ${vecs.length} vectors for ${rows.length} texts")
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
  }
}

/** Transport for API-shaped embedding providers: one request = one packed batch
  * of texts → one vector per text, in order. Implementations own auth/wire
  * formats; tests inject fakes (the reference tests monkeypatch the same seam,
  * tests/merge_knn_llm_test.py:259-293).
  */
trait EmbeddingTransport extends Serializable {
  def request(texts: Seq[String]): Seq[Array[Double]]
}

/** API-shaped embedder with the reference's request semantics:
  *
  *  - char-budget packing: texts accumulate into one request until adding the
  *    next would exceed `charBudget` (~5000 chars, reference utils.py:215-229);
  *    every request carries at least one text.
  *  - retry with exponential backoff: attempt n sleeps `initialBackoffMs·2^n`
  *    before retrying, up to `maxRetries` (reference utils.py:366-369 — 15s·2^n,
  *    shortened in tests).
  *
  * The shipped engine has no live transport (zero-egress container); wire a
  * real one by implementing [[EmbeddingTransport]].
  */
class HttpEmbedder(
    transport: EmbeddingTransport,
    val dim: Int,
    charBudget: Int = 5000,
    maxRetries: Int = 5,
    initialBackoffMs: Long = 15000L,
    batchSizeRows: Int = 2048) extends BatchedEmbedder(batchSizeRows) {

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
    HttpEmbedder.packByCharBudget(texts, charBudget)
      .flatMap(pack => requestWithRetry(pack))

  private def requestWithRetry(pack: Seq[String]): Seq[Array[Double]] =
    HttpWire.withBackoff(maxRetries, initialBackoffMs) { () =>
      val out = transport.request(pack)
      require(out.length == pack.length,
        s"transport returned ${out.length} vectors for ${pack.length} texts")
      out
    }
}

object HttpEmbedder {

  /** Greedy char-budget packing preserving order; every pack is non-empty. */
  def packByCharBudget(texts: Seq[String], charBudget: Int): Seq[Seq[String]] = {
    val packs = Seq.newBuilder[Seq[String]]
    val cur = Seq.newBuilder[String]
    var curChars = 0
    var curN = 0
    texts.foreach { t =>
      val len = if (t == null) 0 else t.length
      if (curN > 0 && curChars + len > charBudget) {
        packs += cur.result(); cur.clear(); curChars = 0; curN = 0
      }
      cur += t; curChars += len; curN += 1
    }
    if (curN > 0) packs += cur.result()
    packs.result()
  }
}
