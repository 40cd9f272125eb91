package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector arithmetic over `array<float|double>` columns, built entirely from
  * codegen'd higher-order functions — no UDFs, stays inside whole-stage codegen.
  *
  * Numerical contract: `dot` accumulates left-to-right in double precision and
  * `cosine` is `dot/(sqrt(na)*sqrt(nb))`, which is bitwise-identical to DuckDB's
  * `list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))` — the t2
  * oracle relies on this (verified empirically on the testdata embeddings).
  *
  * Replaces the reference's numpy/FAISS kernels (reference:
  * src/linktransformer/utils.py:102-114, infer.py:141-151).
  */
object VectorOps {

  /** Cast to array<double> (parquet embeddings are float32). */
  def asDouble(a: Column): Column = a.cast(ArrayType(DoubleType))

  /** Sequential left-to-right double dot product (codegen'd native loop). */
  def dot(a: Column, b: Column): Column = VecExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; formula order matters for oracle bit-parity, and the
    * result is clamped to [-1, 1] exactly like DuckDB's list_cosine_similarity
    * (self-pairs can exceed 1.0 by an ulp in raw double arithmetic).
    */
  def cosine(a: Column, b: Column): Column =
    least(greatest(dot(a, b) / (norm(a) * norm(b)), lit(-1.0)), lit(1.0))

  /** Cosine with per-side precomputed norms (compute `norm(v)` once per ROW,
    * not once per PAIR — the O(n·m) join hot path). Bit-identical to
    * [[cosine]]: same `dot/(sqrt(na)*sqrt(nb))` op order, same clamp.
    */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    least(greatest(dotAB / (normA * normB), lit(-1.0)), lit(1.0))

  /** Cosine for pre-L2-normalized vectors (skips the norm recomputation). */
  def cosineNormalized(a: Column, b: Column): Column = dot(a, b)

  /** Manhattan (L1) distance — sequential left-to-right double fold, matching
    * DuckDB `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
    * x -> abs(x[1]-x[2]))), (p,q) -> p+q)` for oracle bit-parity
    * (reference: modified_sbert/evaluation.py:455, paired_manhattan_distances).
    */
  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) distance — sqrt of a sequential sum of squared diffs
    * (reference: evaluation.py:456, paired_euclidean_distances).
    */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

  /** L2-normalize with the reference's epsilon clip (reference: infer.py:815-816). */
  def l2Normalize(a: Column): Column =
    transform(a, x => x / greatest(sqrt(aggregate(zip_with(a, a, (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)), lit(1e-12)))
}
