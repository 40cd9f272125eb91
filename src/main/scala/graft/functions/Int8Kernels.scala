package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Integer dot product over `array<tinyint>` code columns — the scoring
  * kernel for scalar-quantized (int8) embeddings (see
  * [[graft.operators.Quantize]]).
  *
  * Exact integer arithmetic: 64-dim int8 dot is bounded by 64·127² ≈ 10⁶,
  * nowhere near Long overflow even at 4k dims, so the result is
  * bit-reproducible on any engine — unlike float accumulation, there is no
  * summation-order caveat at all. Whole-stage codegen emits a tight
  * primitive loop (`getByte`), zero allocation per row: the same shape as
  * [[VecDot]] but on 1-byte lanes, so the candidate-scoring inner loop
  * touches 8x less memory than the double kernel.
  */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_i8 needs two array<tinyint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "vec_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotI8 =
    copy(left = l, right = r)
}

object Int8Kernels {
  /** Column wrapper for [[VecDotI8]]. */
  def dotI8(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
