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

  /** Extension-routed loader — the reference's path dispatch inside every prep
    * entry point (reference: preprocess.py:304-311): `.xlsx` → Excel, `.csv` →
    * CSV, anything else raises with the reference's message.
    */
  def readAny(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".xlsx")) readExcel(spark, path)
    else if (path.endsWith(".csv")) readCsv(spark, path)
    else throw new IllegalArgumentException(
      "Data should be a path to a csv or excel file or a dataframe")

  /** XLSX source — `pd.read_excel` (reference: preprocess.py:306-307) via the
    * pure-JDK [[Xlsx]] parser (zip + DOM; no external reader dependency).
    * First row = header (pandas default); per-column long/double/string
    * inference mirrors pandas' numeric coercion. Driver-side parse: XLSX is an
    * eager small-file format — convert to Parquet for anything at data scale.
    */
  def readExcel(
      spark: SparkSession, path: String,
      sheetName: Option[String] = None,
      header: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val sheet = Xlsx.readSheet(path, sheetName)
    if (sheet.rows.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[SRow](), StructType(Nil))
    val width = sheet.rows.map(_.length).max
    val (names, dataRows) =
      if (header) {
        val h = sheet.rows.head.padTo(width, None)
        (h.zipWithIndex.map { case (c, i) => c.getOrElse(s"_c$i") }, sheet.rows.tail)
      } else (Vector.tabulate(width)(i => s"_c$i"), sheet.rows)
    val padded = dataRows.map(_.padTo(width, None))
    val types = (0 until width).map(i =>
      Xlsx.inferType(padded.flatMap(_(i))))
    val schema = StructType(names.zip(types).map {
      case (n, "long") => StructField(n, LongType)
      case (n, "double") => StructField(n, DoubleType)
      case (n, _) => StructField(n, StringType)
    })
    val rows = new java.util.ArrayList[SRow](padded.length)
    padded.foreach { r =>
      rows.add(SRow.fromSeq(r.zip(types).map {
        case (Some(v), "long") => v.toLongOption.getOrElse(v.toDouble.toLong)
        case (Some(v), "double") => v.toDouble
        case (Some(v), _) => v
        case (None, _) => null
      }))
    }
    spark.createDataFrame(rows, schema)
  }
}
