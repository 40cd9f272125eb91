package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources/sinks (SURVEY §2.1). The reference reads CSV/XLSX eagerly with
  * pandas; here readers return lazy DataFrames so Catalyst pushes filters and
  * prunes columns into the scan. XLSX is intentionally unsupported (no bundled
  * reader; convert to CSV/Parquet upstream), matching the documented scope.
  */
object Io {

  /** CSV with header + schema inference — `pd.read_csv`
    * (reference: preprocess.py:308-309). For production-scale data prefer an
    * explicit schema: inference scans the file once before the real read.
    */
  def readCsv(spark: SparkSession, path: String, inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", "true").option("inferSchema", inferSchema.toString).csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines read (config files, relevant-docs sidecars). */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** CSV sink with header — `to_csv` (reference: preprocess.py:648-649). */
  def writeCsv(df: DataFrame, path: String, coalesceTo: Int = 0): Unit = {
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** ORC (native Spark format — columnar alternative for pipelines already on ORC). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines sink (config/metrics sidecars). */
  def writeJsonLines(df: DataFrame, path: String, coalesceTo: Int = 0): Unit = {
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.mode("overwrite").json(path)
  }

  /** Bucketed parquet table for co-located joins: two tables bucketed (and
    * sorted) the same way on the join key equi-join WITHOUT a shuffle — the
    * pre-partitioning is reused across every downstream join/aggregation on
    * that key (the 100 TB pattern for repeatedly-joined dimensions and fact
    * tables). Requires a table name (bucketing metadata lives in the catalog).
    */
  def writeBucketed(
      df: DataFrame, tableName: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  /** Excel is not supported in this build (no bundled reader, zero egress).
    * The reference's `pd.read_excel` sources (preprocess.py:306-307) must be
    * converted to CSV or Parquet before ingestion.
    */
  def readExcel(spark: SparkSession, path: String): DataFrame =
    throw new UnsupportedOperationException(
      s"XLSX not supported ($path): convert to CSV or Parquet (SURVEY §2.1)")
}
