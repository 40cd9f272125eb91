package graft

import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sampling.topFractionSketch]] is rank-exact by construction — these pin
  * it bit-identical to [[Sampling.topFractionExact]] on adversarial inputs
  * (tie plateaus, tiny groups, pathological sketch accuracy forcing the
  * degraded band branches) and check the scale shape (the window runs over
  * the band, not the group).
  */
class SamplingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def kept(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def mixed: DataFrame = {
    import spark.implicits._
    // group a: 40 distinct scores; group b: one big tie plateau straddling
    // any cutoff; group c/d/e: sizes 1/2/3; group f: heavy duplicate scores
    val rows =
      (0 until 40).map(i => (i.toLong, "a", i * 0.5)) ++
        (100 until 130).map(i => (i.toLong, "b", 7.0)) ++
        Seq((200L, "c", 1.0)) ++
        Seq((210L, "d", 2.0), (211L, "d", 1.0)) ++
        Seq((220L, "e", 3.0), (221L, "e", 3.0), (222L, "e", 1.0)) ++
        (300 until 340).map(i => (i.toLong, "f", (i % 4).toDouble))
    rows.toDF("id", "src", "score")
  }

  test("sketch gate ≡ exact gate across fractions, ties, and tiny groups") {
    val df = mixed
    for (frac <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val ex = kept(Sampling.topFractionExact(df, "score", "id", Seq("src"), frac))
      val sk = kept(Sampling.topFractionSketch(df, "score", "id", Seq("src"), frac))
      assert(sk === ex, s"frac=$frac")
    }
  }

  test("sketch gate ≡ exact gate even with a pathological sketch (accuracy=1)") {
    val df = mixed
    for (frac <- Seq(0.25, 0.5, 0.75)) {
      val ex = kept(Sampling.topFractionExact(df, "score", "id", Seq("src"), frac))
      val sk = kept(Sampling.topFractionSketch(df, "score", "id", Seq("src"), frac,
        accuracy = 1, bandFrac = 0.001))
      assert(sk === ex, s"frac=$frac accuracy=1")
    }
  }

  test("sketch gate ≡ exact gate under repartitioning on real bench data") {
    val d = graft.operators.TextAnalysis.qualityScore(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text")
      .select(col("doc_id").as("id"), col("source").as("src"), col("quality").as("score"))
    val ex = kept(Sampling.topFractionExact(d, "score", "id", Seq("src"), 0.25))
    val sk = kept(Sampling.topFractionSketch(d.repartition(7), "score", "id", Seq("src"), 0.25))
    assert(sk === ex)
    assert(sk.nonEmpty)
  }

  test("scale shape: the band the window sees is a sliver of each group") {
    import spark.implicits._
    // 4000 rows, one group, distinct scores: with default margins the band
    // holds ~2·bandFrac(0.005)+sketch-slack of the rows — assert the window
    // input stays under 5% of the group, so the sketch gate's window is
    // doing band work, not group work
    val df = (0 until 4000).map(i => (i.toLong, "g", i * 1.0)).toDF("id", "src", "score")
    val stats = df.groupBy("src")
      .agg(percentile_approx(col("score"), array(lit(0.745), lit(0.755)), lit(10000)).as("t"))
      .collect().head.getSeq[Double](1)
    val band = df.filter(col("score") >= stats.head && col("score") <= stats(1)).count()
    assert(band <= 200, s"band=$band of 4000")
    // and the gate itself is still exact at this size
    val ex = kept(Sampling.topFractionExact(df, "score", "id", Seq("src"), 0.25))
    val sk = kept(Sampling.topFractionSketch(df, "score", "id", Seq("src"), 0.25))
    assert(sk === ex)
  }
}
