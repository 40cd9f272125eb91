package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion. The reference ships single-system retrieval only
  * (FAISS cosine, infer.py); production retrieval fuses a lexical and a
  * vector system, and the standard parameter-free fusion is reciprocal-rank
  * fusion (Cormack, Clarke & Büttcher, SIGIR 2009 — public):
  * `fused(q,d) = Σ_sys 1/(k0 + rank_sys(q,d))` with the conventional
  * k0 = 60. RRF only consumes RANKS, which this engine produces
  * deterministically everywhere (score desc, id asc) — so the fused
  * relation is bit-reproducible and the DuckDB oracle hash-checks the whole
  * hybrid stack (`q_hybrid_rrf`: persisted-index BM25 ⊕ exact md5-embedding
  * kNN).
  */
object Retrieval {

  /** Fuse per-system top-k results into a fused top-`k` per query.
    *
    * Input contract: every frame in `systems` carries `(query_id, doc_id,
    * rank)` with rank 1-based best-first (the engine's retrieval contract —
    * rename `left_id`/`right_id` from the kNN joins). Output:
    * `(query_id, rank, doc_id, rrf_score)`, rank 1-based by
    * `(rrf_score desc, doc_id asc)`.
    *
    * Determinism: the per-(query, doc) contribution sum folds in SYSTEM
    * order through the native ordered-sum aggregate (one contribution per
    * system, so the fold order is total), making the doubles
    * partition-invariant and engine-reproducible. The ordered-sum key is a
    * string, so the system tag is ZERO-PADDED to three digits — a bare
    * stringified index would fold 10+ systems lexicographically
    * ("0","1","10","2",…), not positionally (advisor r8). The DuckDB
    * oracle mirrors the padded tag.
    *
    * Scale: each input is already a bounded top-k relation (≤ k·|queries|
    * rows), so the union + (query, doc) partial aggregate + bounded top-k
    * shuffle a few k rows per query — nothing corpus-sized moves.
    */
  def rrfFuse(systems: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(systems.nonEmpty, "need at least one system to fuse")
    require(systems.size <= 1000, s"at most 1000 systems (3-digit fold tags), got ${systems.size}")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val pool = systems.zipWithIndex.map { case (df, i) =>
      df.select(
        col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        (lit(1.0) / (lit(k0).cast("double") + col("rank").cast("double"))).as("__contrib"),
        lit(f"$i%03d").as("__sys"))
    }.reduce(_.unionByName(_))
    val fused = pool.groupBy("query_id", "doc_id")
      .agg(graft.functions.VecExpressions
        .orderedSum(col("__sys"), col("__contrib")).as("__rrf"))
    fused.groupBy("query_id")
      .agg(graft.functions.VecExpressions.topK(k, col("__rrf"), col("doc_id")).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__s")))
      .select(
        col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__s.id").as("doc_id"),
        col("__s.score").as("rrf_score"))
  }
}
