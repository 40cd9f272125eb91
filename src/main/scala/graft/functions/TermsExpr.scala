package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native lexical tokenizer: value-identical to the built-in composition
  * `array_remove(split(lower(trim(text)), "[ \t\n\f\r]+"), "")` (the
  * shared engine/oracle tokenizer — see [[graft.operators.Lexical.terms]])
  * but a single byte scan instead of a regex `Pattern.split` per row.
  *
  * Equivalence argument: `trim` only strips 0x20, `split(..., -1)` turns
  * every leading/trailing/repeated delimiter into an empty token, and
  * `array_remove(_, "")` then drops ALL empty tokens — so the composition
  * reduces to "maximal runs of non-delimiter bytes of `lower(text)`", which
  * is exactly what the scan emits. The delimiters are all ASCII (< 0x80) and
  * UTF-8 continuation bytes are ≥ 0x80, so the byte scan can never split
  * inside a multi-byte character; `UTF8String.toLowerCase` is the same
  * kernel the `Lower` expression uses, so case folding is identical by
  * construction. A PropertySpec test re-checks the equivalence on corpus
  * data plus adversarial strings every build.
  */
case class TermsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_terms"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_terms needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TermsExpr.compute($a)")

  override protected def withNewChildInternal(c: Expression): TermsExpr = copy(child = c)
}

object TermsExpr {

  @inline private def isDelim(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Single-pass kernel; static so generated code can call it directly. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    var start = -1
    while (i < n) {
      if (isDelim(bytes(i))) {
        if (start >= 0) { out += UTF8String.fromBytes(bytes, start, i - start); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out.toArray)
  }

  def terms(text: Column): Column =
    ColumnBridge.column(TermsExpr(ColumnBridge.expression(text)))
}
