package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Tombstone deletes for the three persisted index families — the lifecycle
  * verb the append/compact/refit triad was missing. Real corpora shrink as
  * well as grow (takedown requests, retroactive dedup, license filtering),
  * and a 100 TB index cannot pay a rebuild per removal; the reference's
  * workflow (rebuild the frame, re-fit — e.g.
  * /root/reference/src/linktransformer/infer.py dedup paths) assumes
  * in-memory data and has no incremental story at all.
  *
  * Protocol — the same atomic-marker idiom as the append batches, applied to
  * removals: a delete lands as a self-contained directory
  * `path/deletes/<delId>/` holding
  *
  *   - `ids/` — parquet of the deleted doc ids actually PRESENT in the index
  *     at delete time (one `id` long column; requested ids that don't exist,
  *     or were already deleted, are dropped here so the recorded stat deltas
  *     stay exact under replays and overlapping delete sets),
  *   - `delete_meta.json` — the family's exact stat deltas (`n_ids`, dropped
  *     row count `n_rows`, and for BM25 `n_docs`/`sum_dl`, the corpus-stat
  *     sums that must shrink for scores to equal a rebuild's),
  *   - `_COMMITTED` — ONE atomic create after both writes; a crash at any
  *     point leaves the index exactly as before, an uncommitted leftover is
  *     invisible and overwritten by a retry, and a committed `delId` replay
  *     is an idempotent no-op.
  *
  * `open()` in each family reads the committed tombstones and EXCLUDES the
  * ids from the frames it assembles, so every downstream consumer — searches,
  * driver-resident mirrors, compactors — sees the post-delete corpus without
  * knowing deletes exist. Exclusion shape is the repo's bounded-driver
  * pattern: under [[maxDriverDeleteIds]] total ids, one small collect per
  * open turns into a codegen'd `NOT IN` set probe (no join in the serving
  * plans, partition pruning untouched); over it, nothing touches the driver
  * and the exclusion is a distributed left-anti join whose small side AQE
  * broadcasts while it fits.
  *
  * Compaction applies tombstones PHYSICALLY for free — the compactors
  * rebuild from the opened (already-filtered) frames — and ledgers the
  * applied delete ids (`applied_deletes.json`, the absorbed-batches idiom)
  * so a crash-replayed delete against the compacted layout stays a no-op.
  */
object Tombstones {

  private val DelDir = "deletes"
  private val Marker = "_COMMITTED"
  private val LedgerFile = "applied_deletes.json"
  private val MetaFile = "delete_meta.json"

  /** Driver materialization bound for the exclusion set, in total deleted
    * ids across all committed tombstones of one index. Under it the ids are
    * collected once per open and pushed as a literal set probe; over it the
    * exclusion stays a distributed anti-join. The collected bytes are
    * `n_ids * 8`, so the 65536 default is ~512 KB.
    */
  val MaxDriverDeleteIdsKey = "spark.graft.index.maxDriverDeleteIds"
  val DefaultMaxDriverDeleteIds: Long = 1L << 16

  private def maxDriverDeleteIds(spark: SparkSession): Long =
    spark.conf.getOption(MaxDriverDeleteIdsKey).map(_.toLong)
      .getOrElse(DefaultMaxDriverDeleteIds)

  /** One family's view of an index's committed tombstones: the sorted delete
    * ids (the shareKey / census component), the exact summed stat deltas,
    * and the exclusion to apply to id-keyed frames.
    */
  final case class Deletes(
      names: Seq[String],
      nIds: Long,
      nRows: Long,
      nDocs: Double,
      sumDl: Double,
      private val exclusion: Either[Array[Long], DataFrame]) {
    /** Exclude the tombstoned ids from `df` keyed by `idCol`. Literal-set
      * form stays inside whole-stage codegen (In → InSet past the optimizer
      * threshold) and never blocks partition pruning; frame form is a
      * left-anti join (AQE broadcasts the delete side while it fits).
      */
    def exclude(df: DataFrame, idCol: String): DataFrame = exclusion match {
      case Left(ids) =>
        if (ids.isEmpty) df
        else df.filter(!col(idCol).isin(ids.toIndexedSeq: _*))
      case Right(delDf) =>
        df.join(delDf.select(col("id").as("__del_id")),
          df(idCol) === col("__del_id"), "left_anti")
    }
  }

  private[operators] def dirOf(path: String, delId: String): Path =
    new Path(new Path(path, DelDir), delId)

  /** Committed tombstone directories under `path/deletes`, name-sorted —
    * the same visibility rule as the append batches: no `_COMMITTED`, not
    * there.
    */
  private[operators] def committedDeleteDirs(fs: FileSystem, path: String): Seq[Path] = {
    val root = new Path(path, DelDir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, Marker)))
      .map(_.getPath).sortBy(_.getName)
  }

  /** Delete ids already folded into `path`'s base layout by a compaction —
    * a deleter must no-op on these exactly as on a live `_COMMITTED` marker
    * (the absorbed-batches contract, applied to removals).
    */
  private[operators] def appliedDeletes(fs: FileSystem, path: String): Set[String] = {
    val p = new Path(path, LedgerFile)
    if (!fs.exists(p)) return Set.empty
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s).get("applied")
    (0 until node.size()).map(node.get(_).asText()).toSet
  }

  /** Write `dstPath`'s delete ledger = `srcPath`'s ledger ∪ the tombstones
    * the compaction just applied. Called by the compactors AFTER the new
    * layout is fully written, alongside [[IndexMaintenance.carryLedger]].
    */
  private[operators] def carryDeleteLedger(
      fs: FileSystem, srcPath: String, dstPath: String): Unit = {
    val all = appliedDeletes(fs, srcPath) ++
      committedDeleteDirs(fs, srcPath).map(_.getName)
    if (all.isEmpty) return
    val out = fs.create(new Path(dstPath, LedgerFile), true)
    try out.write(all.toSeq.sorted
      .map(id => "\"" + id + "\"").mkString("{\"applied\": [", ", ", "]}")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** True when `delId` is already visible (committed) or ledgered (applied
    * by a compaction) — the deleter's idempotency gate.
    */
  private[operators] def alreadyDeleted(fs: FileSystem, path: String, delId: String): Boolean =
    fs.exists(new Path(dirOf(path, delId), Marker)) ||
      appliedDeletes(fs, path).contains(delId)

  /** Land one tombstone: `foundIds` (one long `id` column — the ids the
    * family resolved as actually present) plus the family's exact stat
    * deltas, committed by one atomic marker create. Caller has already
    * passed [[alreadyDeleted]] and knows `foundIds` is non-empty.
    */
  private[operators] def writeDelete(
      spark: SparkSession, path: String, delId: String,
      foundIds: DataFrame,
      nIds: Long, nRows: Long, nDocs: Double, sumDl: Double): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = dirOf(path, delId)
    // uncommitted leftover from a failed attempt: invisible to open(), safe
    // to drop wholesale and rewrite
    if (fs.exists(dir)) fs.delete(dir, true)
    // tombstone sets are small relative to the index (a takedown batch, not
    // a corpus): one file keeps later opens' exclusion read to one footer
    foundIds.select(col("id").cast("long").as("id"))
      .coalesce(1).write.parquet(new Path(dir, "ids").toString)
    val meta = fs.create(new Path(dir, MetaFile), false)
    try meta.write(
      (s"""{"n_ids": $nIds, "n_rows": $nRows, """ +
        s""""n_docs": $nDocs, "sum_dl": $sumDl, """ +
        // wall timestamp for the audit surface (the maintenance-log move):
        // WHEN was this takedown applied — compliance wants the answer
        s""""at": ${System.currentTimeMillis()}}""").getBytes("UTF-8"))
    finally meta.close()
    fs.create(new Path(dir, Marker), false).close()
  }

  /** The tombstone audit surface of one index as a DataFrame — one row per
    * committed delete (`del_id`, the exact recorded deltas, and the wall
    * timestamp the takedown was applied). Compliance's question — "what was
    * removed, how much, and when" — answered from the index directory alone;
    * exposed to SQL as the `graft_index_deletes` TVF. Empty frame when the
    * index has no tombstones; pre-r13 metas without `at` read back as null.
    */
  def deletesDf(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("del_id", StringType), StructField("n_ids", LongType),
      StructField("n_rows", LongType), StructField("n_docs", DoubleType),
      StructField("sum_dl", DoubleType), StructField("at", LongType)))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows: java.util.List[org.apache.spark.sql.Row] =
      committedDeleteDirs(fs, path).map { d =>
        val in = fs.open(new Path(d, MetaFile))
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val n = mapper.readTree(s)
        org.apache.spark.sql.Row(d.getName, n.get("n_ids").asLong(),
          n.get("n_rows").asLong(), n.get("n_docs").asDouble(),
          n.get("sum_dl").asDouble(),
          Option(n.get("at")).map(v => java.lang.Long.valueOf(v.asLong())).orNull)
      }.asJava
    spark.createDataFrame(rows, schema)
  }

  /** Read `path`'s committed tombstones into one [[Deletes]] view; None when
    * the index has none (the overwhelmingly common case — zero overhead:
    * one `exists` on the deletes dir). Under [[maxDriverDeleteIds]] total
    * ids this pays ONE small job per open to collect the exclusion set
    * (footer-bounded single-file reads); over it the ids stay distributed.
    */
  private[operators] def read(spark: SparkSession, path: String): Option[Deletes] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = committedDeleteDirs(fs, path)
    if (dirs.isEmpty) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var nIds = 0L; var nRows = 0L; var nDocs = 0.0; var sumDl = 0.0
    dirs.foreach { d =>
      val in = fs.open(new Path(d, MetaFile))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val node = mapper.readTree(s)
      nIds += node.get("n_ids").asLong()
      nRows += node.get("n_rows").asLong()
      nDocs += node.get("n_docs").asDouble()
      sumDl += node.get("sum_dl").asDouble()
    }
    val idPaths = dirs.map(d => new Path(d, "ids").toString)
    val idsDf = idPaths.map(spark.read.parquet(_)).reduce(_.unionByName(_))
    val exclusion =
      if (nIds <= maxDriverDeleteIds(spark))
        Left(idsDf.collect().map(_.getLong(0)))
      else Right(idsDf)
    Some(Deletes(dirs.map(_.getName), nIds, nRows, nDocs, sumDl, exclusion))
  }
}
