package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Signed-random-projection LSH band signatures for cosine similarity.
  *
  * Output element `b` packs `bitsPerBand` sign bits of the vector projected
  * onto deterministic Rademacher (±1) hyperplanes — two vectors collide on a
  * band with probability `(1 - θ/π)^bitsPerBand` (θ = angle between them), the
  * standard SRP-LSH family. Hyperplane entries come from a splitmix64 of
  * `(seed, bitIndex, dim)`, so no hyperplane matrix is materialized or
  * broadcast: the whole signature is one codegen'd arithmetic pass per row.
  * This is the candidate-generation kernel that replaces the O(n²) ε-graph
  * self-scan at scale (bucket equi-join instead of all-pairs).
  */
case class SrpBands(child: Expression, nBands: Int, bitsPerBand: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bands needs array<double>, 1<=bitsPerBand<=64, nBands>=1; got $t / $nBands / $bitsPerBand")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpBands.compute(input.asInstanceOf[ArrayData], nBands, bitsPerBand, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SrpBands.compute($a, $nBands, $bitsPerBand, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): SrpBands = copy(child = c)
}

object SrpBands {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Static one-pass kernel; generated code calls it directly. */
  def compute(vec: ArrayData, nBands: Int, bitsPerBand: Int, seed: Long): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](nBands)
    var bit = 0
    var b = 0
    while (b < nBands) {
      var packed = 0L
      var r = 0
      while (r < bitsPerBand) {
        var s = 0.0
        var d = 0
        while (d < dim) {
          // Rademacher hyperplane entry from (seed, global bit index, dim)
          val h = splitmix64(seed ^ (bit.toLong << 32) ^ d.toLong)
          val w = if ((h & 1L) == 0L) 1.0 else -1.0
          s += w * vec.getDouble(d)
          d += 1
        }
        packed = (packed << 1) | (if (s > 0.0) 1L else 0L)
        r += 1
        bit += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  def srpBands(vec: Column, nBands: Int, bitsPerBand: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SrpBands(ColumnBridge.expression(vec), nBands, bitsPerBand, seed))
}
