package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (term-based) retrieval and language-model scoring for training-data
  * pipelines: BM25 top-k search (the classic sparse-retrieval baseline every
  * dense-retrieval eval compares against, and the candidate generator for
  * hard-negative mining) and corpus-derived unigram log-loss (a KenLM-style
  * perplexity quality filter without an external model).
  *
  * Everything is built from codegen'd built-ins over an inverted-index-shaped
  * dataflow (explode → partial-agg → equi-join) — no crossJoin, no UDFs, no
  * driver-side state — so the plans scale to a 100 TB corpus: each shuffle
  * AGGREGATES (corpus → distinct (doc,term) pairs → per-query top-k), never
  * fans out.
  */
object Lexical {

  /** ASCII-whitespace tokenizer (lowercased, blanks dropped) shared by every
    * lexical operator AND the SQL oracles. The explicit character class — not
    * `\s` — because Java's `\s` includes vertical tab while RE2-style engines'
    * does not; the explicit class means any engine reproduces the tokens.
    */
  def terms(text: Column): Column =
    filter(split(lower(trim(text)), "[ \\t\\n\\u000B\\f\\r]+"), t => t =!= "")

  /** BM25 top-k retrieval of documents for each query row.
    *
    * Score per (query, doc) = Σ over shared terms of
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the Robertson
    * `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))` (the Lucene formula, public).
    * Returns `(query_id, rank, doc_id, score)`, rank 1-based by
    * `(score desc, doc_id asc)` — deterministic under ties.
    *
    * Scale shape (each step shrinks the data):
    *  1. one (doc,term) shuffle building tf, with doc length `dl` computed
    *     narrowly BEFORE the explode and carried through the aggregate — no
    *     separate doc-length join;
    *  2. document frequencies are computed only for terms that actually occur
    *     in a query (left-semi first), so the full corpus vocabulary never
    *     leaves its aggregate; the surviving df table and the query-term table
    *     are broadcast (queries ≪ corpus is the operating regime — for a huge
    *     query side, swap the broadcasts for plain equi-joins and let AQE
    *     handle the hot-term skew);
    *  3. per-(query,doc) scores are folded in sorted term order — bit-exact
    *     reproducible by any engine, regardless of partitioning;
    *  4. the final per-query top-k uses the native bounded [[TopKAggregate]]:
    *     only ≤k rows per query cross the last shuffle (map-side pruned).
    */
  def bm25TopK(
      docs: DataFrame, docId: String, docText: String,
      queries: DataFrame, queryId: String, queryText: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, b in [0,1], got k1=$k1 b=$b")
    val tokens = docs.select(
      col(docId).cast("long").as("doc_id"),
      size(terms(col(docText))).cast("double").as("dl"),
      explode(terms(col(docText))).as("term"))
    val tf = tokens.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    // one-row corpus stats; crossJoin(broadcast) keeps them plan-side (no
    // collect, no extra job)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(terms(col(docText))).cast("double")).as("avgdl"))
    val qterms = queries.select(
      col(queryId).cast("long").as("query_id"),
      explode(array_distinct(terms(col(queryText)))).as("term"))
    val dfCounts = tf.join(qterms.select("term").distinct(), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfCounts), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // fold the per-pair sum in sorted term order: partition-invariant and
    // bit-identical across engines (a plain sum(double) is accumulation-order
    // dependent)
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("__cs"))
      .withColumn("score",
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")))
    scored.groupBy("query_id")
      .agg(graft.functions.VecExpressions.topK(k, col("score"), col("doc_id")).as("__t"))
      .select(col("query_id"), posexplode(col("__t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }

  /** Corpus-derived unigram log-loss per document: average
    * `−log2 p(token)` (bits per token) under the add-one-smoothed unigram
    * model of the corpus ITSELF — `p(t) = (count(t)+1) / (T+V)`. High scores
    * flag documents full of corpus-rare tokens (lorem/garbage/OCR noise), low
    * scores flag boilerplate — the shape of a KenLM perplexity filter
    * (public CCNet recipe) with the LM fitted in-flight instead of loaded.
    *
    * Appends `lm_n_tokens` and `lm_bits_per_token` (0.0 for blank docs — they
    * carry no evidence either way; filter them on `lm_n_tokens` if unwanted).
    *
    * Scale: one (doc,term) shuffle for tf, one vocabulary aggregate (rows =
    * distinct terms), one tf⋈vocab equi-join — the vocab side is unique per
    * term so hot terms cannot go quadratic, and AQE broadcasts it when small.
    * Per-doc folds run in sorted term order (engine-reproducible, see
    * [[bm25TopK]]).
    */
  def unigramBitsPerToken(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ln2 = lit(0.6931471805599453) // double nearest ln 2; both engines divide by it
    val tokens = df.select(col(idCol).as("__id"), explode(terms(col(textCol))).as("term"))
    val tf = tokens.groupBy("__id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val vocab = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val totals = vocab.agg(
      sum(col("c")).as("t_tokens"), count(lit(1)).cast("double").as("v_size"))
    val perDoc = tf
      .join(vocab, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("__bits",
        col("tf") * negate(log((col("c") + 1.0) / (col("t_tokens") + col("v_size")))) / ln2)
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("term"), col("__bits"), col("tf")))).as("__cs"))
      .withColumn("lm_n_tokens",
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("tf")).cast("long"))
      .withColumn("lm_bits_per_token",
        aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("__bits"))
          / col("lm_n_tokens").cast("double"))
      .select(col("__id"), col("lm_n_tokens"), col("lm_bits_per_token"))
    df.join(perDoc, df(idCol) === perDoc("__id"), "left")
      .withColumn("lm_n_tokens", coalesce(col("lm_n_tokens"), lit(0L)))
      .withColumn("lm_bits_per_token", coalesce(col("lm_bits_per_token"), lit(0.0)))
      .drop("__id")
  }
}
