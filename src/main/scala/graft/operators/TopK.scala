package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One (candidate id, score) pair flowing through the top-k aggregator. */
case class Scored(score: Double, id: Long)

/** Bounded top-k aggregator with deterministic tie-breaking `(score desc, id asc)`
  * — the FAISS-insertion-order tie-break replacement mandated by SURVEY §4.3.
  *
  * This is the scale-critical primitive behind the kNN join: because it is an
  * `Aggregator`, Spark runs it with partial (map-side) aggregation, so the O(n·m)
  * score stream is reduced to ≤k rows per left key per partition BEFORE the
  * shuffle. A window row_number() over the raw scores would shuffle all n·m rows.
  * (Replaces FAISS `index.search(emb, k)`, reference: src/linktransformer/infer.py:678,
  * and the chunked `torch.topk` + heap merge in modified_sbert/evaluation.py:249-274.)
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, "k must be >= 1")

  // a strictly precedes b in the ranking
  @inline private def precedes(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def zero: Seq[Scored] = Vector.empty

  private def insert(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && !precedes(a, b.last)) b
    else {
      val idx = b.indexWhere(x => precedes(a, x))
      val nb = if (idx < 0) b :+ a else (b.take(idx) :+ a) ++ b.drop(idx)
      if (nb.size > k) nb.take(k) else nb
    }

  def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = insert(b, a)
  def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = b2.foldLeft(b1)(insert)
  def finish(b: Seq[Scored]): Seq[Scored] = b

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  /** Column function: topK(k)(score, id) -> array<struct<score,id>> sorted best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    (score: Column, id: Column) => f(score, id)
  }
}
