package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a driver-built [[BloomFilter]], as a native codegen
  * predicate: the membership probe runs INSIDE whole-stage codegen in the
  * scan stage, so a corpus can be pruned against a small reference set
  * (benchmark n-grams, blocklists, id sets) before any join or shuffle
  * machinery sees a row — the decontamination shape at 100 TB, where the
  * filter is kilobytes and the corpus is not. One-sided error: `false`
  * proves absence, `true` may be a false positive at the configured fpp, so
  * exactness-preserving callers ([[graft.operators.Dedup.ngramContaminationBloom]])
  * verify survivors against the true set — the filter only bounds how many
  * rows reach that verify.
  *
  * The filter travels as its serialized bytes (the case-class field), and
  * each executor inflates it once lazily — `util.sketch`'s own stream
  * format, no Java-serialization assumptions about the impl class.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain needs a bigint probe (hash the key first), got $t")
  }

  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (serialized with its bytes) and probe its
    // lazily-inflated filter — the reference array ships the bytes, each
    // executor pays one readFrom
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bloom().mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Predicate column: does `probe` (a bigint hash) possibly belong to
    * `bloom`? Serializes the filter once at plan-build time.
    */
  def mightContain(probe: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(probe), out.toByteArray))
  }
}
