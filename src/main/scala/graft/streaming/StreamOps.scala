package graft.streaming

import graft.embed.Embedder
import graft.operators.SemanticJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming surface (stretch scope per SURVEY §2.10 — the reference
  * has no streaming; these lift the engine's embed→match pipeline and the
  * training-pipeline hygiene ops onto unbounded inputs).
  *
  * All operators take/return streaming DataFrames and follow the standard
  * watermark + append-mode contract so they compose with any
  * `readStream`/`writeStream` pair.
  */
object StreamOps {

  /** Event-time windowed counts with a watermark — the canonical streaming agg
    * over the `events` table shape `(event_id, ts, user_id, event_type, value)`.
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"), col("sum_value"))

  /** Streaming exact dedup on key columns within the watermark horizon —
    * `dropDuplicates` with state eviction (the streaming form of Dedup.exact).
    */
  def streamingDedup(
      df: DataFrame, keys: Seq[String],
      tsCol: String = "ts", watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming semantic enrichment: embed the incoming text column and 1-NN
    * match each micro-batch against a STATIC reference table (stream-static
    * pattern: the reference side is embedded once up front, broadcast per
    * batch; per-batch work is embed(new rows) + broadcast kNN — no unbounded
    * state). Returns a `DataStreamWriter` wired through `foreachBatch`;
    * caller sets output sink/trigger and starts it.
    */
  def semanticEnrich(
      stream: DataFrame, textCol: String,
      refDf: DataFrame, refId: String, refTextCol: String,
      embedder: Embedder,
      onBatch: DataFrame => Unit): DataStreamWriter[Row] = {
    // embed the static side ONCE at plan time, not per micro-batch
    val ref = embedder
      .embed(refDf.select(col(refId).cast("long").as("__rid"), col(refTextCol)),
        refTextCol, "__rvec")
      .select("__rid", "__rvec")
      .localCheckpoint(true)

    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val withId = batch.withColumn("__lid", monotonically_increasing_id())
          val emb = embedder.embed(withId, textCol, "__lvec").localCheckpoint(true)
          val knn = SemanticJoin.knnJoinVec(
            emb, "__lid", "__lvec", ref, "__rid", "__rvec", k = 1)
          val out = emb.drop("__lvec")
            .join(knn.select(col("left_id").as("__lid"),
              col("right_id").as("match_id"), col("score")), Seq("__lid"))
            .drop("__lid")
          onBatch(out)
        }
      }
  }
}
