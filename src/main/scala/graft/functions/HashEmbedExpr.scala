package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the deterministic hash-projection embedding
  * (graft.embed.HashEmbedder semantics, bit-identical): keeps the embed
  * projection inside whole-stage codegen instead of fencing it behind a Scala
  * UDF's serializer boundary. Null-propagating; the `hashEmbed` helper
  * coalesces null text to "" (HashEmbedder contract).
  */
case class HashEmbedExpr(child: Expression, dim: Int, tokenMix: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hash_embed needs string and dim >= 1, got $t / $dim")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashEmbedExpr.compute(input.asInstanceOf[UTF8String], dim, tokenMix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashEmbedExpr.compute($a, $dim, $tokenMix)")

  override protected def withNewChildInternal(c: Expression): HashEmbedExpr = copy(child = c)
}

object HashEmbedExpr {

  /** Static kernel (generated code calls it). */
  def compute(text: UTF8String, dim: Int, tokenMix: Boolean): ArrayData =
    new GenericArrayData(graft.embed.HashEmbedder.embedText(text.toString, dim, tokenMix))

  /** Null text embeds as "" (HashEmbedder contract). */
  def hashEmbed(text: Column, dim: Int, tokenMix: Boolean): Column =
    ColumnBridge.column(HashEmbedExpr(
      ColumnBridge.expression(coalesce(text, lit(""))), dim, tokenMix))
}
