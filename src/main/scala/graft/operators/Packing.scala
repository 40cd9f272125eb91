package graft.operators

import graft.core.Prefix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the last step of a pretraining data
  * pipeline: documents are concatenated in a deterministic order and cut into
  * fixed-size training sequences of `budget` tokens (the public GPT-style
  * "concatenate and chunk" recipe). Each document learns which sequence it
  * lands in and at what offset, so the actual tensor-building pass can run
  * embarrassingly parallel with no further coordination.
  */
object Packing {

  /** Assign each row a training-sequence id and offset under a token budget.
    *
    * Documents are laid out end-to-end in ascending `ordCol` order; sequence
    * boundaries fall every `budget` tokens regardless of document boundaries
    * (documents crossing a cut are flagged, so a caller that prefers
    * no-straddle packing can re-route just those). Appends:
    *  - `seq_id`: 0-based id of the sequence this row STARTS in,
    *  - `seq_offset`: token offset of the row's first token within that
    *    sequence (in `[0, budget)`),
    *  - `crosses_cut`: true iff the row's tokens straddle a sequence boundary.
    *
    * Rows with 0 tokens get the position they'd occupy (offset of the next
    * token) and never cross a cut.
    *
    * Scale: the only global state is the running token total, computed with
    * the distributed prefix scan ([[graft.core.Prefix.cumSums]]) — one
    * range-shuffle plus a ≤numShufflePartitions-row offsets pass; no
    * unpartitioned window, no driver materialization. Token totals are summed
    * as doubles (exact below 2^53 — i.e. up to ~9e15 tokens, two orders of
    * magnitude past a 100 TB corpus) and the derived ids are integer math on
    * the exact longs.
    */
  def packTokens(
      df: DataFrame, ordCol: String, tokenCountCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // reject null/negative counts up front (advisor r3): a null would be
    // silently skipped by the prefix sum — shifting every later row's offsets
    // — and a negative count corrupts the layout; both are data bugs the
    // caller must see, not absorb
    val n = col(tokenCountCol)
    val checked = df.withColumn(tokenCountCol,
      when(n.isNull || n < 0, raise_error(concat(
        lit(s"packTokens: '$tokenCountCol' must be non-null and >= 0, got "),
        coalesce(n.cast("string"), lit("null"))))).otherwise(n))
    val cum = Prefix.cumSums(checked, Seq(col(ordCol)), Seq(tokenCountCol))
    val cumCol = s"__cum_$tokenCountCol"
    cum
      .withColumn("__end", col(cumCol).cast("long"))
      .withColumn("__start", col("__end") - col(tokenCountCol).cast("long"))
      .withColumn("seq_id", expr(s"__start div ${budget}L"))
      .withColumn("seq_offset", col("__start") - col("seq_id") * budget)
      .withColumn("crosses_cut",
        col(tokenCountCol) > 0 && expr(s"(__end - 1) div ${budget}L") > col("seq_id"))
      .drop(cumCol, "__end", "__start")
  }
}
