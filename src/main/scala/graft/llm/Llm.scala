package graft.llm

import graft.core.Serialize
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM row operators: classification, batch transformation, and pair
  * adjudication — the reference's OpenAI/Gemini-backed stages
  * (reference: src/linktransformer/infer.py:990-1519, utils.py:267-494)
  * re-expressed as pluggable partition operators.
  *
  * Each provider sits behind a trait; the engine runs it inside `mapPartitions`
  * so calls batch per partition and parallelize across executors (strictly
  * better than the reference's serial driver loop, SURVEY §3.2). This container
  * is zero-egress, so the shipped implementations are deterministic stubs with
  * the same interface, batching, and error semantics a real HTTP provider
  * (retry + exponential backoff, reference utils.py:366-369) would plug into.
  */
object Llm {

  /** Parse an LLM judge response into (isMatch ∈ {0,1}, confidence ∈ [0,1]).
    *
    * Permissive-parser port (reference: infer.py:877-921): try JSON-ish field
    * extraction first; fall back to yes/no keywords for the match and the LAST
    * number in free text for the confidence (reference: infer.py:913-917), then
    * clamp to [0,1] (infer.py:920).
    */
  def parseJudgeResponse(raw: String): (Int, Double) = {
    if (raw == null) return (0, 0.0)
    val lower = raw.toLowerCase
    val isMatchField = """"?is_match"?\s*[:=]\s*(true|false|1|0|"?yes"?|"?no"?)""".r
    val isMatch = isMatchField.findFirstMatchIn(lower).map(_.group(1).replace("\"", "")) match {
      case Some("true") | Some("1") | Some("yes") => 1
      case Some("false") | Some("0") | Some("no") => 0
      case _ =>
        if (lower.contains("\"match\"") || lower.matches("(?s).*\\byes\\b.*")) 1
        else 0
    }
    val confField = """"?confidence"?\s*[:=]\s*([0-9]*\.?[0-9]+)""".r
    val conf = confField.findFirstMatchIn(lower).map(_.group(1).toDouble).orElse {
      // fallback: LAST number anywhere in the text
      val nums = """[0-9]*\.?[0-9]+""".r.findAllIn(lower).toList
      nums.lastOption.map(_.toDouble)
    }.getOrElse(0.0)
    (isMatch, math.max(0.0, math.min(1.0, conf)))
  }

  /** Adjudicates one candidate pair; payloads are the serialized key columns. */
  trait PairJudge extends Serializable {
    /** Returns the raw response string (parsed by [[parseJudgeResponse]]). */
    def judge(leftPayload: String, rightPayload: String): String
  }

  /** Deterministic judge: match iff lowercase token Jaccard >= threshold;
    * confidence = the Jaccard itself. Emits a JSON-shaped raw response so the
    * permissive parser path is exercised end-to-end.
    */
  class TokenOverlapJudge(threshold: Double = 0.5) extends PairJudge {
    def judge(l: String, r: String): String = {
      val a = l.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
      val b = r.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
      val j = if (a.isEmpty && b.isEmpty) 1.0
        else if (a.isEmpty || b.isEmpty) 0.0
        else a.intersect(b).size.toDouble / a.union(b).size.toDouble
      val m = j >= threshold
      f"""{"is_match": $m, "confidence": $j%.4f}"""
    }
  }

  /** Classifies one serialized row into a label id. */
  trait RowClassifier extends Serializable {
    def classify(batch: Seq[String]): Seq[Int]
  }

  /** Deterministic stub classifier: stable hash of the text modulo numLabels —
    * the interface twin of the reference's HF-Trainer / OpenAI paths
    * (infer.py:1306-1422), batched per partition like batch Trainer.predict.
    * Uses the same rolling code-point hash as `TextAnalysis.fingerprint`
    * (`(acc·31 + cp) mod 1e9+7`) so a SQL oracle can replicate predictions.
    */
  class HashClassifier(numLabels: Int) extends RowClassifier {
    def classify(batch: Seq[String]): Seq[Int] = batch.map { s =>
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = Math.floorMod(h * 31 + cp, 1000000007L)
        i += Character.charCount(cp)
      }
      (h % numLabels).toInt
    }
  }

  /** Transforms a chunk of rows; must return exactly as many outputs as inputs
    * (the reference enforces this on the JSON-array reply, utils.py:453-457).
    */
  trait BatchTransformer extends Serializable {
    def transform(chunk: Seq[String]): Seq[String]
  }

  /** Deterministic stub transformer: uppercases (SQL-oracle-checkable). */
  class UppercaseTransformer extends BatchTransformer {
    def transform(chunk: Seq[String]): Seq[String] = chunk.map(s => if (s == null) null else s.toUpperCase)
  }

  // ---------------------------------------------------------------------------

  /** `classify_rows` — append `clf_preds` label column (reference: infer.py:1306-1389). */
  def classifyRows(
      df: DataFrame, on: Seq[String], clf: RowClassifier,
      outCol: String = "clf_preds", batchSize: Int = 128,
      labelMap: Map[Int, String] = Map.empty,
      sep: String = " "): DataFrame = {
    val serialized = df.withColumn("__graft_text",
      Serialize.serializeColumns(on.map(df(_)), sep))
    val schema = serialized.schema.add(StructField(outCol, IntegerType, nullable = false))
    val textIdx = serialized.schema.fieldNames.indexOf("__graft_text")
    // typed mapPartitions (single serialization fence), not df.rdd — the RDD
    // hop pays an extra InternalRow→Row conversion and breaks codegen around
    // the stage (pattern: Multimodal.withMediaMeta)
    val out = serialized.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val preds = clf.classify(rows.map(r => Option(r.getString(textIdx)).getOrElse("")))
        rows.zip(preds).map { case (r, p) => Row.fromSeq(r.toSeq :+ p) }
      }
    }(RowEncoder.encoderFor(schema))
    val withLabels =
      if (labelMap.isEmpty) out
      else {
        val mapCol = map(labelMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        out.withColumn(outCol, mapCol(col(outCol)))
      }
    withLabels.drop("__graft_text")
  }

  /** `transform_rows` — append `transformed` column via chunked batch transform
    * (reference: infer.py:1426-1519; chunk default 50 per utils.py:390).
    * Enforces the reference's strict length check per chunk.
    */
  def transformRows(
      df: DataFrame, on: Seq[String], t: BatchTransformer,
      outCol: String = "transformed", chunkSize: Int = 50,
      sep: String = " "): DataFrame = {
    val serialized = df.withColumn("__graft_text",
      Serialize.serializeColumns(on.map(df(_)), sep))
    val schema = serialized.schema.add(StructField(outCol, StringType, nullable = true))
    val textIdx = serialized.schema.fieldNames.indexOf("__graft_text")
    serialized.mapPartitions { it =>
      it.grouped(chunkSize).flatMap { rows =>
        val outs = t.transform(rows.map(_.getString(textIdx)))
        require(outs.size == rows.size,
          s"BatchTransformer returned ${outs.size} rows for a chunk of ${rows.size}")
        rows.zip(outs).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(RowEncoder.encoderFor(schema)).drop("__graft_text")
  }

  /** Generic single-column transform — the reference's `transform_column`
    * higher-order op (utils.py:467-494): applies `fn` to one existing column,
    * writing `transformed_<col>` (chunked through the same strict-length
    * machinery as [[transformRows]]).
    */
  def transformColumn(
      df: DataFrame, column: String, fn: String => String,
      outCol: String = null, chunkSize: Int = 50): DataFrame = {
    val out = if (outCol == null) s"transformed_$column" else outCol
    val t = new BatchTransformer {
      def transform(chunk: Seq[String]): Seq[String] = chunk.map(fn)
    }
    transformRows(df, Seq(column), t, out, chunkSize)
  }

  /** `merge_k_judge` — retrieve top-k candidates semantically, then adjudicate
    * each pair with the judge; appends llm_is_match / llm_confidence /
    * llm_raw_response and applies the optional confidence filter
    * (reference: infer.py:990-1205).
    */
  def mergeKJudge(
      df1: DataFrame, df2: DataFrame,
      on: Seq[String] = Nil, leftOn: Seq[String] = Nil, rightOn: Seq[String] = Nil,
      embedder: graft.embed.Embedder,
      judge: PairJudge,
      k: Int = 5,
      confidenceThreshold: Option[Double] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val (lk, rk) = graft.core.Keys.resolve(df1.columns, df2.columns, on, leftOn, rightOn)
    val candidates = graft.operators.SemanticJoin.mergeKnn(
      df1, df2, on, leftOn, rightOn, embedder, k, suffixes)

    // payload columns: suffixed key cols when the name collided, plain otherwise
    val shared = df1.columns.toSet.intersect(df2.columns.toSet)
    val lCols = lk.map(c => if (shared(c)) c + suffixes._1 else c)
    val rCols = rk.map(c => if (shared(c)) c + suffixes._2 else c)
    val withPayload = candidates
      .withColumn("__lp", Serialize.serializeColumns(lCols.map(col), " "))
      .withColumn("__rp", Serialize.serializeColumns(rCols.map(col), " "))
    val judged = judgePairs(withPayload, "__lp", "__rp", judge).drop("__lp", "__rp")

    confidenceThreshold match {
      case Some(t) => judged.filter(col("llm_confidence") >= t)
      case None => judged
    }
  }

  /** Adjudicate ALREADY-PAIRED rows — the judge stage alone, for pipelines
    * whose candidate generation is not a semantic merge (e.g. BM25 retrieval
    * → embedding re-rank → judge). Appends `llm_is_match` / `llm_confidence`
    * / `llm_raw_response` from `judge` over the two payload string columns;
    * [[mergeKJudge]] is this operator applied to its own kNN candidates.
    * Executor-side `mapPartitions` (one serialization fence), never a
    * driver-side loop — the reference iterates `candidates.iterrows()`
    * single-process (infer.py:1148); here the judge runs where the rows are.
    */
  def judgePairs(
      df: DataFrame, leftPayloadCol: String, rightPayloadCol: String,
      judge: PairJudge): DataFrame = {
    val schema = df.schema
      .add(StructField("llm_is_match", IntegerType, nullable = false))
      .add(StructField("llm_confidence", DoubleType, nullable = false))
      .add(StructField("llm_raw_response", StringType, nullable = true))
    val lpIdx = df.schema.fieldNames.indexOf(leftPayloadCol)
    val rpIdx = df.schema.fieldNames.indexOf(rightPayloadCol)
    require(lpIdx >= 0, s"column $leftPayloadCol not found")
    require(rpIdx >= 0, s"column $rightPayloadCol not found")
    df.mapPartitions { it =>
      it.map { r =>
        val raw = judge.judge(
          Option(r.getString(lpIdx)).getOrElse(""),
          Option(r.getString(rpIdx)).getOrElse(""))
        val (m, c) = parseJudgeResponse(raw)
        Row.fromSeq(r.toSeq ++ Seq(m, c, raw))
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Backward-compat alias of [[mergeKJudge]] (reference: infer.py:1208-1254). */
  def mergeKnnWithLlm(
      df1: DataFrame, df2: DataFrame,
      on: Seq[String] = Nil, leftOn: Seq[String] = Nil, rightOn: Seq[String] = Nil,
      embedder: graft.embed.Embedder, judge: PairJudge, k: Int = 5,
      confidenceThreshold: Option[Double] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame =
    mergeKJudge(df1, df2, on, leftOn, rightOn, embedder, judge, k, confidenceThreshold, suffixes)

  /** Backward-compat alias of [[mergeKJudge]] (reference: infer.py:1257-1303). */
  def mergeKnnOpenai(
      df1: DataFrame, df2: DataFrame,
      on: Seq[String] = Nil, leftOn: Seq[String] = Nil, rightOn: Seq[String] = Nil,
      embedder: graft.embed.Embedder, judge: PairJudge, k: Int = 5,
      confidenceThreshold: Option[Double] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame =
    mergeKJudge(df1, df2, on, leftOn, rightOn, embedder, judge, k, confidenceThreshold, suffixes)
}
