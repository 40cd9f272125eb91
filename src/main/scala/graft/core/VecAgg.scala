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
}
