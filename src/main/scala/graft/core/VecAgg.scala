package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector aggregation over `array<double>` columns as plain DataFrame jobs. */
object VecAgg {

  /** Element-wise mean vector per key: explode by position → partial-agg avg →
    * reassemble in position order. One shuffle on (key, position); the
    * collect_list per key is dim-bounded.
    */
  def elementWiseMean(
      df: DataFrame, keyCol: String, vecCol: String, outCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col(keyCol), col("__p")).agg(avg("__x").as("__m"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("__p"), col("__m")))).as("__sm"))
      .select(col(keyCol), expr("transform(__sm, s -> s.__m)").as(outCol))

  /** Deterministic element-wise mean with an explicit fold order: per key,
    * member vectors fold in `idxCol` order (`zip_with` running sums over the
    * idx-sorted collect), then divide by the member count — so the doubles
    * are bit-reproducible on any engine, unlike [[elementWiseMean]]'s
    * shuffle-order `avg`. The chunk→document pooling primitive (RAG / corpus
    * plumbing: embed chunks, pool back to a doc vector).
    *
    * Scale: one shuffle on the key; the per-key collect is bounded by the
    * members-per-key contract (chunks per document — pages, not corpora).
    * For unbounded groups where fold order doesn't need to be reproducible,
    * use [[elementWiseMean]] (position-keyed partial agg, nothing collected).
    */
  def elementWiseMeanOrdered(
      df: DataFrame, keyCol: String, idxCol: String, vecCol: String,
      outCol: String): DataFrame =
    df.select(col(keyCol), struct(col(idxCol).as("__i"), col(vecCol).as("__v")).as("__s"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("__s"))).as("__vs"))
      .select(col(keyCol), size(col("__vs")).as("__n"),
        expr("aggregate(slice(__vs, 2, size(__vs) - 1), __vs[0].__v," +
          " (acc, s) -> zip_with(acc, s.__v, (a, b) -> a + b))").as("__sum"))
      .select(col(keyCol),
        expr("transform(__sum, x -> x / CAST(__n AS DOUBLE))").as(outCol),
        col("__n").cast("long").as("n_members"))
}
