package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-scan primitives — the scale-safe replacement for
  * unpartitioned windows. `Window.orderBy(...)` with no partition key funnels
  * every row into a single task, which is fine at 60k rows and fatal at 100 TB.
  * These keep full parallelism: range-partition on the sort key, scan each
  * partition locally, and stitch partitions together with per-partition offsets
  * (one extra aggregation job over ≤numShufflePartitions rows).
  */
object Prefix {

  /** Running (inclusive) sums of `sumCols` over `df` in global `sort` order.
    * Adds one `__cum_<c>` double column per input column. Values are summed as
    * doubles — exact for counts and 0/1 flags below 2^53, which covers every
    * caller in this engine.
    *
    * Shape: range-shuffle by `sort` → per-partition window scan (parallel) +
    * a tiny per-partition-totals aggregate whose own cumulative runs over
    * ≤numShufflePartitions rows on the driver.
    */
  def cumSums(df: DataFrame, sort: Seq[Column], sumCols: Seq[String]): DataFrame =
    cumSumsWithTotals(df, sort, sumCols)._1

  /** [[cumSums]] plus the grand total per sum column — already computed by the
    * offsets pass, so callers needing a total (row counts, total positives)
    * save one aggregation job.
    */
  def cumSumsWithTotals(
      df: DataFrame, sort: Seq[Column], sumCols: Seq[String]): (DataFrame, Array[Double]) = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins the sampled range boundaries: the offsets job and
    // the final scan must observe identical partition ids.
    val parted = df.repartitionByRange(np, sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPid = parted.groupBy("__pid")
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .collect().sortBy(_.getInt(0))
    // exclusive running totals per pid, computed driver-side (≤np rows)
    val acc = Array.fill(sumCols.length)(0.0)
    val offsetRows = perPid.map { r =>
      val row = org.apache.spark.sql.Row.fromSeq(r.getInt(0) +: acc.toSeq)
      sumCols.indices.foreach { i =>
        acc(i) += Option(r.get(i + 1)).fold(0.0)(_.asInstanceOf[Number].doubleValue)
      }
      row
    }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid", org.apache.spark.sql.types.IntegerType) +:
        sumCols.map(c => org.apache.spark.sql.types.StructField(
          s"__off_$c", org.apache.spark.sql.types.DoubleType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toSeq, 1), offSchema)
    val w = Window.partitionBy("__pid").orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = sumCols.foldLeft(parted.join(broadcast(offsets), "__pid")) { (d, c) =>
      d.withColumn(s"__cum_$c", sum(col(c).cast("double")).over(w) + col(s"__off_$c"))
    }
    // acc now holds the grand totals (exclusive offsets folded over every pid)
    (withCums.drop("__pid" +: sumCols.map(c => s"__off_$c"): _*), acc)
  }

  /** Per-key running sums: like [[cumSumsWithTotals]] but with an independent
    * prefix scan per distinct value of `keyCols`, all executed in ONE
    * range-shuffle + ONE offsets pass (instead of one full sweep per key —
    * k independent sweeps cost k× the jobs and k× the scans of the input).
    *
    * Range-partitions on (keys ++ sort), so each key's rows are globally
    * ordered across partitions; offsets are computed per (partition, key) in a
    * single driver-side pass over ≤ numShufflePartitions × |keys| rows.
    * Intended for a SMALL key domain (score functions, metric names — not
    * user-data keys); the per-key grand totals come back as a driver map.
    */
  def cumSumsKeyedWithTotals(
      df: DataFrame, keyCols: Seq[String], sort: Seq[Column], sumCols: Seq[String])
      : (DataFrame, Map[Seq[Any], Array[Double]]) = {
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(np, keyCols.map(col) ++ sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPidKey = parted.groupBy(("__pid" +: keyCols).map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .collect().sortBy(_.getInt(0))
    val nk = keyCols.length
    val acc = scala.collection.mutable.Map.empty[Seq[Any], Array[Double]]
    val offsetRows = perPidKey.map { r =>
      val key = (0 until nk).map(i => r.get(i + 1))
      val cur = acc.getOrElseUpdate(key, Array.fill(sumCols.length)(0.0))
      val row = org.apache.spark.sql.Row.fromSeq(r.getInt(0) +: key ++: cur.toSeq)
      sumCols.indices.foreach { i =>
        cur(i) += Option(r.get(i + 1 + nk)).fold(0.0)(_.asInstanceOf[Number].doubleValue)
      }
      row
    }
    val keyFields = keyCols.map(c => df.schema(c))
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid", org.apache.spark.sql.types.IntegerType) +:
        keyFields ++:
        sumCols.map(c => org.apache.spark.sql.types.StructField(
          s"__off_$c", org.apache.spark.sql.types.DoubleType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toSeq, 1), offSchema)
    val w = Window.partitionBy(("__pid" +: keyCols).map(col): _*).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = parted.join(broadcast(offsets), "__pid" +: keyCols)
    val withCums = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"__cum_$c", sum(col(c).cast("double")).over(w) + col(s"__off_$c"))
    }
    (withCums.drop("__pid" +: sumCols.map(c => s"__off_$c"): _*),
      acc.view.mapValues(_.clone()).toMap)
  }

  /** Global 0-based dense index over `df`'s rows in `sort` order (rows must be
    * distinct under `sort`). Fully parallel — the distributed `ngroup`.
    */
  def globalIndex(df: DataFrame, sort: Seq[Column], outCol: String): DataFrame =
    globalIndexWithCount(df, sort, outCol)._1

  /** [[globalIndex]] plus the row count (free — see [[cumSumsWithTotals]]). */
  def globalIndexWithCount(
      df: DataFrame, sort: Seq[Column], outCol: String): (DataFrame, Long) = {
    val withOne = df.withColumn("__one", lit(1L))
    val (cum, totals) = cumSumsWithTotals(withOne, sort, Seq("__one"))
    val indexed = cum
      .withColumn(outCol, (col("__cum___one") - 1).cast("long"))
      .drop("__one", "__cum___one")
    (indexed, totals(0).toLong)
  }
}
