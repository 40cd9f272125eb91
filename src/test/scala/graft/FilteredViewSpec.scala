package graft

import graft.operators.{Dedup, Lexical}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The allow-list filtered-view contract across the retrieval families
  * ([[Lexical.bm25FilteredView]], [[Dedup.minhashFilteredView]]; the ANN
  * view has its own oracle legs).
  *
  * BM25 is the family where the filter has SEMANTICS to get wrong:
  * filter-context scoring means corpus-global statistics (n_docs, avgdl,
  * per-term df) stay those of the full corpus and only the candidate set
  * shrinks — so an allowed doc must score bit-identically with and without
  * the filter, in every scoring regime (batch-fold, joined over-bound
  * guard, resident-eligible pinned index), and on an APPENDED stale-bake
  * index whose df is recomputed in-plan (the recompute must see the
  * UNFILTERED postings or df silently becomes subset-df).
  */
class FilteredViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(ids: Range): DataFrame = {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    ids.map { i =>
      val words = (0 until (3 + i % 5)).map(j => vocab((i * 3 + j * 2) % vocab.size))
      (i.toLong, (words :+ s"id$i").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def bm25Rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  /** Reference semantics computed from the UNFILTERED search at k = corpus
    * size: drop disallowed docs, re-close ranks, cut to k. Scores must carry
    * over bit-for-bit (filter-context: the filter never changes a score).
    */
  private def expectedFiltered(
      unfilteredAll: Seq[(Long, Long, Long, Double)],
      allow: Long => Boolean, k: Int): Seq[(Long, Long, Long, Double)] =
    unfilteredAll.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
      rs.sortBy(_._2).filter(t => allow(t._3)).take(k).zipWithIndex
        .map { case ((q, _, d, s), i) => (q, (i + 1).toLong, d, s) }
    }.sortBy(t => (t._1, t._2))

  test("bm25 filtered view: allowed scores bit-identical, ranks re-closed, " +
      "in batch-fold AND over-bound joined regimes") {
    val d = docs(0 until 120)
    val dir = tmp("graft_bmflt_spec")
    val (p, s) = Lexical.bm25BuildIndex(d, "doc_id", "text")
    Lexical.bm25WriteIndex(p, s, dir, nBuckets = 8)
    val idx = Lexical.bm25OpenIndex(spark, dir)
    val q = d.filter(col("doc_id") < 6)
    val allow: Long => Boolean = _ % 3 == 0

    val all = bm25Rows(Lexical.bm25SearchIndex(idx, q, "doc_id", "text", k = 120))
    val expected = expectedFiltered(all, allow, k = 5)

    val view = Lexical.bm25FilteredView(idx,
      d.filter(col("doc_id") % 3 === 0).select("doc_id"), "doc_id")
    val got = bm25Rows(Lexical.bm25SearchIndex(view, q, "doc_id", "text", k = 5))
    assert(got == expected)

    // over-bound guard regime: force the joined distributed path and demand
    // the same rows — the allow semi-join sits in scoreAndTopK there
    val key = Lexical.MaxQueryTermRowsKey
    spark.conf.set(key, "1")
    try {
      val gotJoined = bm25Rows(Lexical.bm25SearchIndex(view, q, "doc_id", "text", k = 5))
      assert(gotJoined == expected)
    } finally spark.conf.unset(key)
  }

  test("bm25 filtered view on an APPENDED (stale-bake) index: df recomputed " +
      "from UNFILTERED postings — filtered search equals the rebuilt index's") {
    val full = docs(0 until 120)
    val base = full.filter(col("doc_id") % 4 =!= 1)
    val held = full.filter(col("doc_id") % 4 === 1)
    val appDir = tmp("graft_bmflt_app")
    val (bp, bs) = Lexical.bm25BuildIndex(base, "doc_id", "text")
    Lexical.bm25WriteIndex(bp, bs, appDir, nBuckets = 8)
    Lexical.bm25AppendIndex(spark, appDir, held, "doc_id", "text", "held")

    val fullDir = tmp("graft_bmflt_full")
    val (fp, fs) = Lexical.bm25BuildIndex(full, "doc_id", "text")
    Lexical.bm25WriteIndex(fp, fs, fullDir, nBuckets = 8)

    val q = full.filter(col("doc_id") < 6)
    val allowDf = full.filter(col("doc_id") % 3 === 0).select("doc_id")
    def flt(dir: String): Seq[(Long, Long, Long, Double)] =
      bm25Rows(Lexical.bm25SearchIndex(
        Lexical.bm25FilteredView(Lexical.bm25OpenIndex(spark, dir), allowDf, "doc_id"),
        q, "doc_id", "text", k = 5))
    // if the appended index's in-plan df recompute saw the FILTERED postings,
    // its (subset) df would diverge from the rebuilt index's baked full df
    assert(flt(appDir) == flt(fullDir))
  }

  test("bm25 filtered view ignores residency: a pinned resident-eligible index " +
      "still serves the filtered search correctly (distributed plan)") {
    val d = docs(0 until 60)
    val dir = tmp("graft_bmflt_res")
    val (p, s) = Lexical.bm25BuildIndex(d, "doc_id", "text")
    Lexical.bm25WriteIndex(p, s, dir, nBuckets = 8)
    val idx = Lexical.bm25OpenIndex(spark, dir)
    idx.postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      .count() // pin → unfiltered searches are resident-eligible
    try {
      val q = d.filter(col("doc_id") < 4)
      // prime the resident mirror via an unfiltered search
      Lexical.bm25SearchIndex(idx, q, "doc_id", "text", k = 3).collect()
      val all = bm25Rows(Lexical.bm25SearchIndex(idx, q, "doc_id", "text", k = 60))
      val expected = expectedFiltered(all, _ % 2 == 0, k = 3)
      val view = Lexical.bm25FilteredView(idx,
        d.filter(col("doc_id") % 2 === 0).select("doc_id"), "doc_id")
      val got = bm25Rows(Lexical.bm25SearchIndex(view, q, "doc_id", "text", k = 3))
      assert(got == expected)
    } finally idx.postings.unpersist()
  }

  test("minhash filtered view: exactly the unfiltered matches restricted to " +
      "allowed corpus ids") {
    import spark.implicits._
    // near-dup pairs: consecutive ids share most of their text
    val d = (0 until 80).map { i =>
      val core = s"shared text block number ${i / 2} with stable words"
      (i.toLong, s"$core tail$i")
    }.toDF("doc_id", "text")
    val dir = tmp("graft_mhflt_spec")
    Dedup.minhashWriteIndex(Dedup.minhashBuildIndex(d, "doc_id", "text"), dir)
    val idx = Dedup.minhashOpenIndex(spark, dir)
    val batch = d.filter(col("doc_id") % 10 === 0)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("corpus_id").cast("long"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val all = pairs(Dedup.minhashSearchIndex(idx, batch, "doc_id", "text", 0.5))
    val view = Dedup.minhashFilteredView(idx,
      d.filter(col("doc_id") % 3 === 0).select("doc_id"), "doc_id")
    val got = pairs(Dedup.minhashSearchIndex(view, batch, "doc_id", "text", 0.5))
    assert(got == all.filter(_._1 % 3 == 0))
    assert(got.nonEmpty, "fixture must produce allowed matches")
    assert(all.exists(_._1 % 3 != 0), "fixture must produce disallowed matches")
  }
}
