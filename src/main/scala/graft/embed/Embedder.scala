package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable embedding stage: `DataFrame(..., textCol) => DataFrame(..., outCol: array<double>)`.
  *
  * This is the engine's load-bearing boundary (SURVEY §7.1 module 2), replacing the
  * reference's model routing in src/linktransformer/utils.py:179-248. Real model
  * providers (ONNX local model, HTTP embedding APIs with char-budget batching and
  * retry/backoff per reference utils.py:215-229, 366-369) plug in behind this trait
  * as `mapPartitions` operators with an executor-local model cache; this container is
  * zero-egress so the shipped implementations are deterministic.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Append `outCol` (a unit-norm array<double> of length `dim`) derived from `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame

  /** True when callers should embed DISTINCT texts and join the vectors back
    * (the reference's embed-each-string-once optimization,
    * evaluation.py:448-451): worth a shuffle when each embedding costs real
    * model/API work. False for codegen-cheap embedders, where the extra
    * distinct+join would cost more than re-embedding.
    */
  def preferDedup: Boolean = false
}

object Embedder {

  /** Embed each distinct value of `textCol` once and join the vectors back —
    * the dedup-embed shape behind [[Embedder.preferDedup]]. The vector table
    * is checkpointed so both the join and any downstream branch reuse it.
    */
  def embedDistinct(
      df: org.apache.spark.sql.DataFrame, textCol: String, outCol: String,
      embedder: Embedder): org.apache.spark.sql.DataFrame = {
    val vecs = embedder.embed(df.select(textCol).distinct(), textCol, outCol)
      .localCheckpoint(true)
    df.join(vecs, Seq(textCol))
  }
}

/** Deterministic hash-projection embedder (the test/bench default, SURVEY §5.2).
  *
  * Maps text -> seeded pseudo-random unit vector: FNV-1a 64 over UTF-8 bytes seeds a
  * splitmix64 stream that fills `dim` uniform [-1,1) coordinates, then L2-normalizes.
  * Identical texts get identical vectors, so kNN/range/cluster results are exactly
  * reproducible (replaces the reference tests' monkeypatched embedding maps,
  * reference: tests/infer_test.py:204-233).
  *
  * Token-aware mode (`tokenMix=true`, the default) averages the hash vectors of
  * whitespace tokens with the whole-string vector, so texts sharing words are closer
  * than unrelated texts — giving the semantic operators non-trivial geometry to rank.
  */
class HashEmbedder(val dim: Int = 64, tokenMix: Boolean = true) extends Embedder {

  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    // native expression, not a Scala UDF: stays inside whole-stage codegen
    // (no serializer fence around every embed projection)
    df.withColumn(outCol,
      graft.functions.HashEmbedExpr.hashEmbed(col(textCol), dim, tokenMix))
}

/** Deterministic md5-projection embedder (dim 16, token-aware) whose vectors
  * the DuckDB oracle reproduces bit-identically (`graft.functions.Md5EmbedExpr`)
  * — the embedder behind every hash-checked text-leg query. Same role as
  * [[HashEmbedder]] (deterministic stand-in for model embeddings,
  * SURVEY §5.2) but exactly replicable in SQL, so semantic text operators get
  * a full value-level oracle instead of a rows-only check.
  */
class Md5Embedder extends Embedder {
  val dim: Int = graft.functions.Md5EmbedExpr.Dim

  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, graft.functions.Md5EmbedExpr.md5Embed(col(textCol)))
}

object HashEmbedder {

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Unnormalized hash vector of one string. */
  private def rawVec(s: String, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var state = fnv64(s.getBytes("UTF-8"))
    var i = 0
    while (i < dim) {
      state = splitmix64(state)
      // top 53 bits -> uniform [0,1) -> [-1,1)
      v(i) = (state >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
      i += 1
    }
    v
  }

  def embedText(s: String, dim: Int, tokenMix: Boolean): Array[Double] = {
    val acc = rawVec(s, dim)
    if (tokenMix) {
      val toks = s.trim.split("\\s+").filter(_.nonEmpty)
      var t = 0
      while (t < toks.length) {
        val tv = rawVec(toks(t), dim)
        var i = 0
        while (i < dim) { acc(i) += tv(i); i += 1 }
        t += 1
      }
    }
    var n = 0.0
    var i = 0
    while (i < dim) { n += acc(i) * acc(i); i += 1 }
    val inv = 1.0 / math.max(math.sqrt(n), 1e-12)
    i = 0
    while (i < dim) { acc(i) *= inv; i += 1 }
    acc
  }
}
