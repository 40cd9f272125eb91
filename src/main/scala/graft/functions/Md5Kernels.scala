package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MD5-derived deterministic kernels.
  *
  * Rationale: the engine's deterministic test/bench kernels (hash embedder,
  * simhash, minhash) must be REPLICABLE BY THE SQL ORACLE to be
  * hash-checkable, and `md5` is the one hash both Spark and DuckDB compute
  * bit-identically (`md5(s)` = lowercase hex of the RFC 1321 digest of the
  * UTF-8 bytes in both engines). Every kernel here is therefore defined
  * purely in terms of md5 bytes plus integer/IEEE-double arithmetic whose op
  * order is mirrored exactly in the oracle SQL (see SparkEntry.oracleSql).
  *
  * All whitespace handling uses the EXPLICIT ASCII class `[ \t\n\x0B\f\r]`
  * (not `\s`) — the repo-wide convention (see TextAnalysis.PiiPatterns) so
  * Java and RE2 regex dialects cannot diverge.
  */
object Md5 {

  /** MD5 is stateful; one digest instance per thread. */
  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def bytes(s: String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes("UTF-8"))
  }

  /** First 4 digest bytes, big-endian, as an unsigned 32-bit value in a Long —
    * equals DuckDB `('0x' || substr(md5(s), 1, 8))::BIGINT`.
    */
  def hash32(s: String): Long = {
    val b = bytes(s)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** First 8 digest bytes, big-endian, as a signed 64-bit value — the same bit
    * pattern as DuckDB `('0x' || substr(md5(s), 1, 16))::UBIGINT`.
    */
  def hash64(s: String): Long = {
    val b = bytes(s)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    h
  }

  private[functions] val AsciiWsSplit = "[ \\t\\n\\u000B\\f\\r]+"
}

/** Deterministic md5-projection embedding (dim = 16, one digest byte per
  * coordinate). Token-aware like [[HashEmbedExpr]]: the byte vectors of the
  * whole string and of each whitespace token accumulate in INTEGER space
  * (order-independent, exact), then a single centering/scale/normalize pass in
  * doubles whose op order the DuckDB oracle mirrors — so the output vectors
  * are bit-identical across engines and the semantic-join/dedup text legs
  * become hash-checkable instead of rows-only.
  */
case class Md5EmbedExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "md5_embed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_embed needs string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5EmbedExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Md5EmbedExpr.compute($a)")

  override protected def withNewChildInternal(c: Expression): Md5EmbedExpr = copy(child = c)
}

object Md5EmbedExpr {

  val Dim = 16

  /** Static kernel (generated code calls it). Oracle parity contract:
    * items = whole string :: non-empty ASCII-whitespace tokens of trim(s);
    * S_i   = Σ over items of byte_i(md5(item))          (exact integer)
    * acc_i = (S_i − 127.5·|items|) / 127.5              (one rounding)
    * out_i = acc_i · (1 / max(sqrt(Σ acc_i²), 1e-12))   (Σ left-to-right)
    */
  def compute(text: UTF8String): ArrayData =
    new GenericArrayData(embedText(text.toString))

  def embedText(s: String): Array[Double] = {
    val acc = new Array[Long](Dim)
    @inline def add(item: String): Unit = {
      val h = Md5.bytes(item)
      var i = 0
      while (i < Dim) { acc(i) += (h(i) & 0xff); i += 1 }
    }
    add(s)
    var t = 1
    val trimmed = s.trim
    if (trimmed.nonEmpty) {
      val toks = trimmed.split(Md5.AsciiWsSplit)
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) { add(toks(i)); t += 1 }
        i += 1
      }
    }
    val v = new Array[Double](Dim)
    var n = 0.0
    var i = 0
    while (i < Dim) {
      v(i) = (acc(i) - 127.5 * t) / 127.5
      n += v(i) * v(i)
      i += 1
    }
    val inv = 1.0 / math.max(math.sqrt(n), 1e-12)
    i = 0
    while (i < Dim) { v(i) *= inv; i += 1 }
    v
  }

  /** Null text embeds as "" (same contract as [[HashEmbedExpr.hashEmbed]]). */
  def md5Embed(text: Column): Column =
    ColumnBridge.column(Md5EmbedExpr(ColumnBridge.expression(coalesce(text, lit("")))))
}

/** 64-bit SimHash over whitespace tokens with md5 token hashes: bit b of the
  * fingerprint is the sign (>= 0) of Σ over tokens of ±1 on bit b of
  * md5-hash64(token). Replaces the earlier FNV/splitmix UDF: same semantics,
  * but the fingerprint is now expressible in the DuckDB oracle (md5 + bit
  * arithmetic) and the kernel stays inside whole-stage codegen.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash64Expr.compute($a)")

  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

object SimHash64Expr {

  /** Empty token list leaves every counter at 0, and 0 >= 0 sets the bit, so
    * the empty-text fingerprint is all-ones (-1L) — degenerate inputs collide
    * on purpose (identical texts must collide; see Dedup.simhashDedup).
    */
  def compute(text: UTF8String): Long = simhashText(text.toString)

  def simhashText(s: String): Long = {
    val trimmed = s.trim.toLowerCase
    val counts = new Array[Int](64)
    if (trimmed.nonEmpty) {
      val toks = trimmed.split(Md5.AsciiWsSplit)
      var t = 0
      while (t < toks.length) {
        if (toks(t).nonEmpty) {
          val z = Md5.hash64(toks(t))
          var bit = 0
          while (bit < 64) {
            if (((z >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
        t += 1
      }
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) { if (counts(bit) >= 0) fp |= (1L << bit); bit += 1 }
    fp
  }

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(coalesce(text, lit("")))))
}

/** MinHash signature with md5-derived hashing — the oracle-expressible family.
  *
  * Per shingle one md5 (h = unsigned 32-bit of the first 4 digest bytes), then
  * per component j the affine remix `(a_j·h + b_j) mod 4294967291` with 30-bit
  * md5-derived coefficients (a_j odd), so products stay under 2^62 — exact in
  * both JVM longs and DuckDB BIGINTs. Same one-pass structure as the xxhash
  * kernel [[MinHashSig]], which remains the cheaper non-oracle family.
  */
case class MinHashSigMd5(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_md5 needs array<string> and numHashes >= 1, got $t / $numHashes")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigMd5.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashSigMd5.compute($a, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSigMd5 = copy(child = c)
}

object MinHashSigMd5 {

  val Prime = 4294967291L // largest 32-bit prime

  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  /** a_j = (hash32("graft-mh-a" + j) & 0x3fffffff) | 1 (odd, 30-bit);
    * b_j =  hash32("graft-mh-b" + j) & 0x3fffffff — derivable in SQL.
    */
  def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, { n =>
      val a = new Array[Long](n)
      val b = new Array[Long](n)
      var j = 0
      while (j < n) {
        a(j) = (Md5.hash32("graft-mh-a" + j) & 0x3fffffffL) | 1L
        b(j) = Md5.hash32("graft-mh-b" + j) & 0x3fffffffL
        j += 1
      }
      (a, b)
    })

  /** Single-pass kernel; empty shingle arrays give all-null components
    * ([[MinHashSig]] parity).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) {
      new GenericArrayData(new Array[Any](numHashes))
    } else {
      val (a, b) = coeffs(numHashes)
      val mins = new Array[Long](numHashes)
      java.util.Arrays.fill(mins, Long.MaxValue)
      var i = 0
      while (i < m) {
        val h = Md5.hash32(arr.getUTF8String(i).toString)
        var k = 0
        while (k < numHashes) {
          val v = (a(k) * h + b(k)) % Prime
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  def minhashSigMd5(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigMd5(ColumnBridge.expression(shingles), numHashes))
}

/** SRP-LSH band signatures with md5-derived Rademacher hyperplanes — the
  * oracle-expressible family of [[SrpBands]]. Hyperplane sign (bit, d) is the
  * parity of md5("graft-srp-bit-d"); the per-(totalBits, dim) sign matrix is
  * built once per JVM and cached (128 bits × dim doubles — 4 MB at dim 4096),
  * so each row is one cached-array arithmetic pass like the splitmix kernel.
  * [[SrpBands]] remains the constant-memory non-oracle variant.
  */
case class SrpBandsMd5(child: Expression, nBands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bands_md5 needs array<double>, 1<=bitsPerBand<=64, nBands>=1; got $t / $nBands / $bitsPerBand")
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpBandsMd5.compute(input.asInstanceOf[ArrayData], nBands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SrpBandsMd5.compute($a, $nBands, $bitsPerBand)")

  override protected def withNewChildInternal(c: Expression): SrpBandsMd5 = copy(child = c)
}

object SrpBandsMd5 {

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]

  /** Flat (totalBits × dim) sign matrix; w(bit, d) = +1 iff parity of
    * md5("graft-srp-$bit-$d") is even — derivable in SQL.
    */
  def signs(totalBits: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((totalBits, dim), { case (tb, dm) =>
      val w = new Array[Double](tb * dm)
      var bit = 0
      while (bit < tb) {
        var d = 0
        while (d < dm) {
          w(bit * dm + d) = if ((Md5.hash32(s"graft-srp-$bit-$d") & 1L) == 0L) 1.0 else -1.0
          d += 1
        }
        bit += 1
      }
      w
    })

  /** Static one-pass kernel (generated code calls it): same packing order as
    * [[SrpBands.compute]] — per band, bits fold MSB-first `(packed<<1)|sign`.
    */
  def compute(vec: ArrayData, nBands: Int, bitsPerBand: Int): ArrayData = {
    val dim = vec.numElements()
    val w = signs(nBands * bitsPerBand, dim)
    val out = new Array[Long](nBands)
    var bit = 0
    var b = 0
    while (b < nBands) {
      var packed = 0L
      var r = 0
      while (r < bitsPerBand) {
        var s = 0.0
        val base = bit * dim
        var d = 0
        while (d < dim) { s += w(base + d) * vec.getDouble(d); d += 1 }
        packed = (packed << 1) | (if (s > 0.0) 1L else 0L)
        r += 1
        bit += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  def srpBandsMd5(vec: Column, nBands: Int, bitsPerBand: Int): Column =
    ColumnBridge.column(SrpBandsMd5(ColumnBridge.expression(vec), nBands, bitsPerBand))
}
