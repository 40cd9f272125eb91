package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature.
  *
  * Bit-identical to the built-in composition
  * `array(seed -> array_min(transform(shingles, s -> xxhash64(s, lit(seed)))))`
  * but exploits that `xxhash64(s, lit(seed))` is a hash CHAIN — the expensive
  * UTF8 hash of `s` (seeded 42) is seed-independent, and each signature
  * component only remixes that 8-byte result with the seed int. So: one string
  * hash per shingle, then numHashes cheap long-mixes, all in a single array
  * traversal — versus numHashes full string-hash passes plus numHashes
  * interpreted lambda arrays for the built-in form.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string> and numHashes >= 1, got $t / $numHashes")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashSig.compute($a, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {

  /** Single-pass kernel; static so generated code can call it directly. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) {
      // built-in parity: array_min(empty) is null per component
      new GenericArrayData(new Array[Any](numHashes))
    } else {
      val mins = new Array[Long](numHashes)
      java.util.Arrays.fill(mins, Long.MaxValue)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        // xxhash64(s, lit(seed)) == chain(seed=42) ∘ hash(s) ∘ hash(seedInt):
        // the string hash happens once, each component remixes 8 bytes
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        var k = 0
        while (k < numHashes) {
          val h = XxHash64Function.hash(k, IntegerType, h1)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text), n))
}

/** Native word n-gram shingling: lowercase, whitespace-tokenize, emit the
  * n-token windows joined by single spaces (texts shorter than n tokens emit
  * one shingle of all tokens). Same output as the built-in
  * `transform(sequence(...), i -> array_join(slice(split(trim(lower(text)))...)))`
  * composition, but one pass with zero interpreted lambdas — the built-in form
  * allocates a slice array + join per shingle and dominated the MinHash
  * pipeline's profile.
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs string and n >= 1, got $t / $n")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordShinglesExpr.compute($a, $n)")

  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
}

object WordShinglesExpr {

  /** Duplicate-n-gram fraction `1 − distinct/total` over the shingle kernel —
    * the SINGLE definition of the repetition-ratio formula, shared by the
    * Column API (`TextAnalysis.repetitionRatio`) and the SQL registration
    * (`word_shingle_rep_ratio`) so the two surfaces cannot drift.
    */
  def repRatio(text: Expression, n: Int): Expression = {
    val sh = WordShinglesExpr(text, n)
    Subtract(Literal(1.0),
      Divide(Cast(Size(ArrayDistinct(sh)), DoubleType), Cast(Size(sh), DoubleType)))
  }

  def repRatioCol(text: Column, n: Int): Column =
    ColumnBridge.column(repRatio(ColumnBridge.expression(text), n))

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.trim.toString.split("\\s+")
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
