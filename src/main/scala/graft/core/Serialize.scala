package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-column key serialization (reference: src/linktransformer/utils.py:116-176).
  *
  * Cells are joined with a separator token; null cells serialize as "" but the
  * separator is still emitted (so `a <SEP> <SEP> c` is possible). This is why
  * `concat_ws` is wrong — it skips nulls (SURVEY §1.4). Placement matters: the
  * serialized string is visible to the LLM judge prompt (reference: infer.py:1098).
  */
object Serialize {

  /** Default separator used by the API-embedding path (reference: infer.py:114-122). */
  val DefaultSep = "<SEP>"

  /** sbert-style fallback separator (reference: utils.py:130-135). */
  val SbertSep = "</s>"

  def serializeColumns(cols: Seq[Column], sep: String = DefaultSep): Column = {
    require(cols.nonEmpty, "serializeColumns needs at least one column")
    val pieces = cols.map(c => coalesce(c.cast("string"), lit("")))
    if (pieces.size == 1) pieces.head
    else concat(pieces.flatMap(p => Seq(p, lit(sep))).dropRight(1): _*)
  }
}
