package graft.core

import org.apache.spark.sql.DataFrame

/** Join-key resolution and suffix handling.
  *
  * Mirrors the reference's key semantics (reference: src/linktransformer/infer.py:56-65):
  * when `on` is omitted, the default join key is the intersection of the two schemas.
  * The reference intersects with Python sets (order-unstable); we intersect in df1's
  * column order, which is deterministic (documented divergence, SURVEY §1.3).
  */
object Keys {

  /** Resolve (leftKeys, rightKeys) from `on` / `leftOn` / `rightOn`. */
  def resolve(
      df1Cols: Seq[String],
      df2Cols: Seq[String],
      on: Seq[String] = Nil,
      leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil): (Seq[String], Seq[String]) = {
    if (on.nonEmpty) (on, on)
    else if (leftOn.nonEmpty || rightOn.nonEmpty) {
      require(leftOn.nonEmpty && rightOn.nonEmpty,
        "left_on and right_on must both be provided")
      require(leftOn.size == rightOn.size, "left_on and right_on must have equal arity")
      (leftOn, rightOn)
    } else {
      // default: column intersection, in df1 order (reference: infer.py:56-57)
      val common = df1Cols.filter(df2Cols.toSet)
      require(common.nonEmpty, "No common columns to join on; pass on/left_on/right_on")
      (common, common)
    }
  }

  /** Pandas-merge-style suffixing: every column name present in BOTH frames gets
    * the left/right suffix on its respective side (reference: infer.py:159 uses
    * pandas merge with suffixes=("_x","_y")). Returns the two renamed frames.
    */
  def suffixConflicts(
      df1: DataFrame,
      df2: DataFrame,
      suffixes: (String, String) = ("_x", "_y")): (DataFrame, DataFrame) = {
    val shared = df1.columns.toSet.intersect(df2.columns.toSet)
    val l = shared.foldLeft(df1)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = shared.foldLeft(df2)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    (l, r)
  }

  /** Guard against reserved internal column collisions (reference: infer.py:95-98). */
  def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val bad = df.columns.toSet.intersect(reserved.toSet)
    require(bad.isEmpty, s"Reserved column name(s) in input: ${bad.mkString(", ")}")
  }

  /** Key-uniqueness validation for a declared merge type (reference:
    * infer.py:67-89, deprecated `merge_type` but still warned on): "1:*"
    * requires unique left keys, "*:1" unique right keys; violations WARN (never
    * raise — matching the reference). Returns the warning messages (empty =
    * clean) so callers/tests can assert; also logs each at WARN.
    */
  def validateMergeType(
      df1: DataFrame, df2: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      mergeType: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    require(Set("1:1", "1:m", "m:1", "m:m")(mergeType), s"bad merge_type: $mergeType")
    def dupCount(df: DataFrame, keys: Seq[String]): Long =
      df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    val warnings = Seq.newBuilder[String]
    if ((mergeType == "1:1" || mergeType == "1:m") && dupCount(df1, leftKeys) > 0)
      warnings += s"merge_type=$mergeType but left keys ${leftKeys.mkString(",")} are not unique"
    if ((mergeType == "1:1" || mergeType == "m:1") && dupCount(df2, rightKeys) > 0)
      warnings += s"merge_type=$mergeType but right keys ${rightKeys.mkString(",")} are not unique"
    val out = warnings.result()
    out.foreach(w => org.slf4j.LoggerFactory.getLogger(getClass).warn(w))
    out
  }
}
