package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published corpus-filtering recipes, as engine
  * operators: the Gopher document-quality gates (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", appendix A1.1) and the C4
  * line-level cleaning rules (Raffel et al. 2019, "Exploring the Limits of
  * Transfer Learning...", §2.2). These are doc-local (no joins, no shuffle,
  * no driver state): narrow projections over the scan, so the filter
  * throughput at 100 TB is the parquet read rate. (The array rules ride HOF
  * expressions — fine here because gates run once per document, not inside
  * a hot per-pair loop like the shared tokenizer was.)
  *
  * Both are exactly reproducible in DuckDB list SQL — every rule is integer
  * counting + IEEE division over the same operands — so the driver queries
  * are hash-gated, not spec-only. (The reference has no corpus gates; this
  * is task-mandate "beyond-reference training-data pipeline" surface, same
  * family as Dedup/Packing/TextAnalysis.)
  */
object CorpusGates {

  /** Whitespace word list with empty tokens dropped (original case). */
  private def words(t: Column): Column =
    filter(split(trim(t), "\\s+"), w => length(w) > 0)

  /** Trimmed, non-empty lines. */
  private def cleanLines(t: Column): Column =
    filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)

  /** Gopher rule A1.1 required stop words ("must contain at least two"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Append the Gopher quality-gate signals and the composite `gopher_pass`:
    * word count in [minWords, maxWords], mean word length in [3, 10],
    * symbol-to-word ratio (# and ...) <= 0.1, bullet-started lines <= 90%,
    * ellipsis-ended lines <= 30%, >= 80% of words with an alphabetic
    * character, >= 2 of the required stop words, duplicate-line fraction
    * <= 0.3. Thresholds are the paper's; the word floor is a parameter
    * because 50 is calibrated for web pages, not short-document corpora.
    */
  def gopherGates(
      df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast("long")
    val lines = cleanLines(t)
    val nLines = size(lines).cast("long")
    val hashCount = length(t) - length(regexp_replace(t, "#", ""))
    val ellipsisCount =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3 +
        (length(t) - length(regexp_replace(t, "…", "")))
    val bulletLines = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("-") || l.startsWith("*")))
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val lw = transform(ws, w => lower(w))
    val stopHits = GopherStopwords
      .map(s => array_contains(lw, s).cast("int"))
      .reduce(_ + _)
    val dupLines = nLines - size(array_distinct(lines)).cast("long")
    val ratio = (num: Column, den: Column) =>
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    df.withColumn("g_n_words", nWords)
      .withColumn("g_mean_word_len",
        ratio(aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long")), nWords))
      .withColumn("g_symbol_ratio", ratio((hashCount + ellipsisCount).cast("long"), nWords))
      .withColumn("g_bullet_line_frac", ratio(bulletLines.cast("long"), nLines))
      .withColumn("g_ellipsis_line_frac", ratio(ellipsisLines.cast("long"), nLines))
      .withColumn("g_alpha_word_frac", ratio(alphaWords.cast("long"), nWords))
      .withColumn("g_stop_hits", stopHits.cast("long"))
      .withColumn("g_dup_line_frac", ratio(dupLines, nLines))
      .withColumn("gopher_pass",
        col("g_n_words").between(minWords, maxWords) &&
          col("g_mean_word_len").between(3.0, 10.0) &&
          col("g_symbol_ratio") <= 0.1 &&
          col("g_bullet_line_frac") <= 0.9 &&
          col("g_ellipsis_line_frac") <= 0.3 &&
          col("g_alpha_word_frac") >= 0.8 &&
          col("g_stop_hits") >= 2 &&
          col("g_dup_line_frac") <= 0.3)
  }

  /** C4 line-level cleaning: keep trimmed lines that end in terminal
    * punctuation (`.!?"'`), have >= `minLineWords` words, and contain no
    * "javascript" / "lorem ipsum" (case-insensitive) or `{`. Appends
    * `c4_text` (kept lines re-joined), `c4_total_lines` / `c4_kept_lines`,
    * and `c4_keep` (>= `minKeptLines` surviving lines — the paper's
    * "at least 3 sentences" page gate).
    */
  def c4Clean(
      df: DataFrame, textCol: String,
      minLineWords: Int = 3, minKeptLines: Int = 3): DataFrame = {
    val t = col(textCol)
    val lines = cleanLines(t)
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minLineWords &&
        !lower(l).contains("javascript") &&
        !lower(l).contains("lorem ipsum") &&
        !l.contains("{"))
    df.withColumn("c4_total_lines", size(lines).cast("long"))
      .withColumn("c4_kept_lines", size(kept).cast("long"))
      .withColumn("c4_text", array_join(kept, "\n"))
      .withColumn("c4_keep", col("c4_kept_lines") >= minKeptLines)
  }
}
