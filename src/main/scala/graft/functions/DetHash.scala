package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE cross-engine deterministic-hash convention (advisor r7: the
  * md5-bucket/Gumbel helpers had drifted into near-duplicate private copies
  * in Sampling and Dsir with subtly different signatures — the kind of
  * duplication that becomes a cross-engine parity bug when one side changes).
  *
  * Contract, mirrored verbatim by every DuckDB oracle that hash-checks a
  * sampling/selection query: `uint32(md5(key || '#' || seed)) mod modulus`,
  * where the uint32 is the first 8 hex chars of the md5 digest — computable
  * by ANY engine with md5, string concat, and integer arithmetic.
  */
object DetHash {

  /** md5 hash bucket in `[0, modulus)` of `key` under `seed`. The key is
    * cast to string first (a no-op for string keys), so long ids and string
    * ids share one convention.
    */
  def md5Bucket(key: Column, seed: Long, modulus: Long = 1000000L): Column =
    pmod(
      conv(substring(md5(concat(key.cast("string"), lit("#" + seed))), 1, 8), 16, 10)
        .cast("long"),
      lit(modulus))

  /** Deterministic Gumbel(0,1) noise from the md5 millionths bucket of the
    * key: `g = −ln(−ln((b + 0.5)/10⁶))` — the standard inverse-CDF draw with
    * a mid-bucket uniform, reproducible by any engine with md5 and ln.
    */
  def gumbelNoise(key: Column, seed: Long): Column = {
    val u = (md5Bucket(key, seed).cast("double") + lit(0.5)) / lit(1000000.0)
    -log(-log(u))
  }
}
