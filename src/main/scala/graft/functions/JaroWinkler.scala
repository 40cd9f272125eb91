package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the record-linkage scorer for short strings
  * (names, codes): Jaro similarity `(m/|a| + m/|b| + (m-t)/m) / 3` over
  * window-matched characters, boosted by the shared prefix (`l <= 4`,
  * `p = 0.1`) when the Jaro score exceeds 0.7. Textbook semantics
  * (Winkler 1990), matching DuckDB's `jaro_winkler_similarity` value-for-value
  * on ASCII strings — including its `0.0` for any comparison involving an empty
  * string — so scored pairs hash-check against the oracle. (DuckDB matches
  * UTF-8 *bytes* while this kernel matches UTF-16 chars, so non-ASCII input
  * can legitimately diverge: `jaro_winkler('née','nee')` is 0.8 here vs 0.75
  * in DuckDB 1.0; per-char semantics are the record-linkage-correct ones.) A native codegen
  * expression: pairs stream through whole-stage codegen with one static call
  * per row, no boxing. Typical use: re-score [[graft.operators.Fuzzy]]
  * candidates, whose deletion blocking bounds the pair set exactly.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two strings, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

object JaroWinklerExpr {

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    // UTF-16 char units; identical to byte semantics on ASCII (names/codes),
    // which is where the DuckDB parity contract applies
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of mutual order, halved
    var half = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) half += 1
        j += 1
      }
      i += 1
    }
    val t = half / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
