package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the r5 per-key-lock hazard: `WeakHashMap` mutates
  * internally even on `get()` (stale-entry expunge), so two executor tasks
  * unpacking DIFFERENT broadcast payloads under per-payload locks could
  * corrupt the shared table or spin a reader. The cache now takes one lock
  * for the whole map; this spec hammers it from many threads alternating
  * over several payloads and checks value correctness plus per-payload
  * memoization.
  */
class MatCacheSpec extends AnyFunSuite {

  private def mkRows(n: Int, seed: Int): Array[InternalRow] = Array.tabulate(n) { i =>
    new GenericInternalRow(Array[Any](i.toLong + seed,
      new GenericArrayData(Array.tabulate(4)(d => (i + d + seed).toDouble))))
  }

  test("concurrent unpack of different broadcast payloads is safe and memoized") {
    val payloads = Array.tabulate(8)(p => mkRows(200, p * 1000))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (0 until 64).map { t =>
        pool.submit(new java.util.concurrent.Callable[graft.operators.VecScan.Mat] {
          override def call(): graft.operators.VecScan.Mat =
            MatCache.get(payloads(t % payloads.length), 0, LongType, 1, DoubleType)
        })
      }
      val results = futures.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      results.zipWithIndex.foreach { case (m, t) =>
        val seed = (t % payloads.length) * 1000
        assert(m.ids.length == 200)
        assert(m.ids(7) == 7L + seed)
        assert(m.vecs(7).toSeq == Seq.tabulate(4)(d => (7 + d + seed).toDouble))
        assert(m.norms(7) == math.sqrt(m.vecs(7).map(x => x * x).sum))
      }
      // memoized: the same payload instance resolves to the same Mat instance
      (0 until payloads.length).foreach { p =>
        assert(results(p) eq results(p + payloads.length))
      }
    } finally pool.shutdownNow()
  }
}
