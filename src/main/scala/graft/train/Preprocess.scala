package graft.train

import graft.core.Serialize
import graft.operators.{Clustering, Dedup}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `preprocess_any_data` dispatch and the paired-label / cluster data-prep
  * dataflows (reference: src/linktransformer/preprocess.py:166-259 dispatch,
  * 264-434 paired, 654-845 cluster, 65-162 check_and_prep, 17-60 check_clust).
  *
  * Everything is a pure DataFrame job: dense ids rank only the distinct-key
  * set (TrainPrep.assignGroupIds), clusters come from the distributed
  * connected components, and splits are deterministic hash buckets instead of
  * the reference's seed-42 `train_test_split` (documented divergence: same
  * proportions, reproducible across engines and cluster sizes — a random
  * split keyed on driver-side list order cannot be reproduced distributed).
  */
object Preprocess {

  /** IR-eval triple: queries(qid,text), corpus(did,text), relevant(qid,did). */
  final case class IrEval(queries: DataFrame, corpus: DataFrame, relevant: DataFrame)

  sealed trait PrepResult
  /** train = (cluster_assignment, texts) member lists. */
  final case class LinkagePrep(train: DataFrame, valIr: IrEval, testIr: Option[IrEval]) extends PrepResult
  /** train = (cluster_assignment, texts); val/test = (left_text, right_text, label). */
  final case class PairedPrep(train: DataFrame, valPairs: DataFrame, testPairs: Option[DataFrame]) extends PrepResult
  final case class ClusPrep(train: DataFrame, valIr: IrEval, testIr: Option[IrEval]) extends PrepResult

  /** Routing wrapper with the reference's mutual-exclusion rules
    * (preprocess.py:202-210): label XOR cluster columns; a cluster id requires
    * cluster text columns and vice versa; otherwise the linkage path.
    */
  def preprocessAnyData(
      df: DataFrame,
      leftCols: Seq[String] = Nil, rightCols: Seq[String] = Nil,
      leftId: Seq[String] = Nil, rightId: Seq[String] = Nil,
      labelCol: Option[String] = None,
      clusIdCol: Option[String] = None, clusTextCols: Seq[String] = Nil,
      valPct: Int = 20, queryProp: Double = 0.5, testAtEnd: Boolean = true,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): PrepResult = {
    if (labelCol.isDefined && clusIdCol.isDefined)
      throw new IllegalArgumentException(
        "Please specify either label_col_name or clusterid_col_name. Not both")
    if (labelCol.isDefined && clusTextCols.nonEmpty)
      throw new IllegalArgumentException(
        "Please specify either label_col_name or cluster_text_col_name. Not both")
    if (clusIdCol.isDefined && clusTextCols.isEmpty)
      throw new IllegalArgumentException(
        "Please specify cluster_text_col_name if you specify clusterid_col_name")
    if (clusTextCols.nonEmpty && clusIdCol.isEmpty)
      throw new IllegalArgumentException(
        "Please specify clusterid_col_name if you specify cluster_text_col_name")
    (labelCol, clusIdCol) match {
      case (Some(lbl), _) =>
        prepPairedLabelData(df, leftCols, rightCols, leftId, rightId, lbl,
          valPct, testAtEnd, ordCol, sep)
      case (_, Some(cid)) =>
        prepClusData(df, clusTextCols, cid, valPct, queryProp, testAtEnd, ordCol, sep)
      case _ =>
        prepLinkageData(df, leftCols, rightCols, leftId, rightId, valPct, testAtEnd, ordCol, sep)
    }
  }

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit =
    cols.foreach { c =>
      if (!df.columns.contains(c))
        throw new IllegalArgumentException(
          s"Column $c not present in data, please check the $what column names")
    }

  private def withOrd(df: DataFrame, ordCol: Option[String]): (DataFrame, String) =
    ordCol match {
      case Some(c) => (df, c)
      // monotonically_increasing_id is unstable across re-evaluations → pin it
      case None => (df.withColumn("__ord", monotonically_increasing_id()).localCheckpoint(true), "__ord")
    }

  private def serialized(df: DataFrame, cols: Seq[String], sep: String): Column =
    // single column passes through raw; >1 serialize (reference preprocess.py:152-162)
    if (cols.length == 1) col(cols.head).cast("string")
    else Serialize.serializeColumns(cols.map(df(_)), sep)

  /** `check_and_prep_data` (reference: preprocess.py:65-162): validate column
    * presence, null-drop (left/right how=all, ids how=any), dedup on
    * left+right keys keep-first, dense string ids `<n>_l` / `<n>_r` from the
    * id columns (or the key columns when absent), serialized `left_text` /
    * `right_text`. Keeps numeric `__lgid`/`__rgid` companions so downstream
    * graph building needs no string parsing.
    */
  def checkAndPrepData(
      df: DataFrame, leftCols: Seq[String], rightCols: Seq[String],
      leftId: Seq[String] = Nil, rightId: Seq[String] = Nil,
      labelCol: Option[String] = None,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): DataFrame = {
    requireCols(df, leftCols, "left")
    requireCols(df, rightCols, "right")
    labelCol.foreach(c => requireCols(df, Seq(c), "label"))
    requireCols(df, leftId, "left id")
    requireCols(df, rightId, "right id")
    var d = df
    if (leftCols.nonEmpty) d = d.na.drop("all", leftCols)
    if (rightCols.nonEmpty) d = d.na.drop("all", rightCols)
    if (leftId.nonEmpty) d = d.na.drop("any", leftId)
    if (rightId.nonEmpty) d = d.na.drop("any", rightId)
    val (ordered, ord) = withOrd(d, ordCol)
    val deduped = Dedup.exact(ordered, leftCols ++ rightCols, ord)
    val lKeys = if (leftId.nonEmpty) leftId else leftCols
    val rKeys = if (rightId.nonEmpty) rightId else rightCols
    val withL = TrainPrep.assignGroupIds(deduped, lKeys, "__lgid")
    val withR = TrainPrep.assignGroupIds(withL, rKeys, "__rgid")
    withR
      .withColumn("left_id", concat(col("__lgid").cast("string"), lit("_l")))
      .withColumn("right_id", concat(col("__rgid").cast("string"), lit("_r")))
      .withColumn("left_text", serialized(withR, leftCols, sep))
      .withColumn("right_text", serialized(withR, rightCols, sep))
  }

  /** Deterministic 3-way split on a hash bucket of `key`: train gets
    * `100-valPct`%, the rest splits equally into val/test when `testAtEnd`
    * (the reference's val_perc + test-halving, preprocess.py:368-374).
    */
  private def splitCol(key: Column, valPct: Int, testAtEnd: Boolean): Column = {
    val bucket = pmod(xxhash64(key), lit(100))
    val trainMax = 100 - valPct
    if (testAtEnd)
      when(bucket < trainMax, "train")
        .when(bucket < trainMax + (100 - trainMax) / 2.0, "val")
        .otherwise("test")
    else when(bucket < trainMax, "train").otherwise("val")
  }

  /** `prep_paired_label_data` (reference: preprocess.py:264-434): prepared
    * pairs split train/val/test; positives in train become edges, connected
    * components become the class label, and the train output is the deduped
    * member-text list per component. Val/test stay as (left_text, right_text,
    * label) for the binary-classification evaluator.
    */
  def prepPairedLabelData(
      df: DataFrame, leftCols: Seq[String], rightCols: Seq[String],
      leftId: Seq[String] = Nil, rightId: Seq[String] = Nil,
      labelCol: String = "label",
      valPct: Int = 20, testAtEnd: Boolean = true,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): PairedPrep = {
    val prepared = checkAndPrepData(df, leftCols, rightCols, leftId, rightId,
      Some(labelCol), ordCol, sep)
      .withColumn("label", col(labelCol).cast("int"))
      .withColumn("__split", splitCol(concat(col("left_id"), col("right_id")), valPct, testAtEnd))
      .localCheckpoint(true) // split + ids branch into train/val/test legs
    val train = prepared.filter(col("__split") === "train")
    // left/right id namespaces are disjoint: node = 2·gid (left), 2·gid+1 (right)
    val pos = train.filter(col("label") === 1)
      .select((col("__lgid") * 2).as("__src"), (col("__rgid") * 2 + 1).as("__dst"))
    val nodes = pos.select(col("__src").as("id")).union(pos.select(col("__dst"))).distinct()
    val comps = Clustering.connectedComponents(nodes, pos)
    val withCluster = train.filter(col("label") === 1)
      .join(comps.withColumnRenamed("id", "__src").withColumnRenamed("component", "cluster_assignment"),
        expr("__src = __lgid * 2"))
    val members = TrainPrep.clusterMembers(
      withCluster.select(col("cluster_assignment"), col("left_text").as("t"))
        .union(withCluster.select(col("cluster_assignment"), col("right_text"))),
      "cluster_assignment", Seq("t"), sep)
      .withColumnRenamed("cluster", "cluster_assignment")
    def pairsOf(split: String) = prepared.filter(col("__split") === split)
      .select("left_text", "right_text", "label")
    PairedPrep(members, pairsOf("val"), if (testAtEnd) Some(pairsOf("test")) else None)
  }

  /** `check_clust_data` (reference: preprocess.py:17-60): validate, null-drop,
    * dense `<n>_g` cluster assignment from the cluster-id column, serialized
    * `text`.
    */
  def checkClustData(
      df: DataFrame, textCols: Seq[String], clusIdCol: String,
      sep: String = Serialize.DefaultSep): DataFrame = {
    requireCols(df, textCols, "text")
    requireCols(df, Seq(clusIdCol), "cluster id")
    val d = df.na.drop("all", textCols).na.drop("any", Seq(clusIdCol))
    val withG = TrainPrep.assignGroupIds(d, Seq(clusIdCol), "__cgid")
    withG
      .withColumn("cluster_assignment", concat(col("__cgid").cast("string"), lit("_g")))
      .withColumn("text", serialized(withG, textCols, sep))
  }

  /** `prep_clus_data` (reference: preprocess.py:654-845): rows already carry a
    * cluster id; split whole clusters train/val/test, emit member lists for
    * train and per-cluster query/corpus IR-eval structures for val/test
    * (first `queryProp` of each cluster queries, the rest corpus; every corpus
    * member of the cluster is relevant to each of its queries).
    */
  def prepClusData(
      df: DataFrame, textCols: Seq[String], clusIdCol: String,
      valPct: Int = 20, queryProp: Double = 0.5, testAtEnd: Boolean = true,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): ClusPrep = {
    val checked0 = checkClustData(df, textCols, clusIdCol, sep)
    val (checked1, ord) = withOrd(checked0, ordCol)
    val checked = checked1
      .withColumn("__split", splitCol(col("__cgid"), valPct, testAtEnd))
      .localCheckpoint(true)
    val train = TrainPrep.clusterMembers(
      checked.filter(col("__split") === "train"), "cluster_assignment", Seq("text"), sep)
      .withColumnRenamed("cluster", "cluster_assignment")
    def ir(split: String) =
      clusterIrSplit(checked.filter(col("__split") === split), "cluster_assignment", "text", ord, queryProp)
    ClusPrep(train, ir("val"), if (testAtEnd) Some(ir("test")) else None)
  }

  /** Per-cluster query/corpus split (reference: preprocess.py:776-794): the
    * first `floor(n·queryProp)` members of each cluster (in `ordCol` order)
    * become queries, the rest corpus; relevant = every (query, corpus) pair
    * within the cluster. All windows partition on the cluster key — parallel.
    */
  def clusterIrSplit(
      df: DataFrame, clusterCol: String, textCol: String, ordCol: String,
      queryProp: Double = 0.5): IrEval = {
    val byCluster = Window.partitionBy(col(clusterCol))
    val ranked = df
      .withColumn("__rn", row_number().over(byCluster.orderBy(col(ordCol))))
      .withColumn("__qcut", floor(count(lit(1)).over(byCluster) * queryProp))
    val queries = ranked.filter(col("__rn") <= col("__qcut"))
      .select(concat(col(clusterCol), lit("_q"), col("__rn")).as("qid"),
        col(textCol).as("text"), col(clusterCol))
    val corpus = ranked.filter(col("__rn") > col("__qcut"))
      .select(concat(col(clusterCol), lit("_c"), col("__rn")).as("did"),
        col(textCol).as("text"), col(clusterCol))
    val relevant = queries.select(col("qid"), col(clusterCol))
      .join(corpus.select(col("did"), col(clusterCol)), Seq(clusterCol))
      .select("qid", "did")
    IrEval(queries.drop(clusterCol), corpus.drop(clusterCol), relevant)
  }

  /** Classifier-training data prep (reference: train_clf_model.py:280-328):
    * validate columns, null-drop, normalize the label column to dense ints —
    * string labels map by FIRST APPEARANCE in `ordCol` order (the reference's
    * `pd.unique` appearance order, made deterministic), floats truncate,
    * ints pass through — serialize the `on` columns to `text`.
    * Returns (prepared rows, labelMap as `(label, label_id)`).
    */
  def prepClassifierData(
      df: DataFrame, on: Seq[String], labelCol: String,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    (on :+ labelCol).foreach { c =>
      if (!df.columns.contains(c))
        throw new IllegalArgumentException(s"Column $c not in data.")
    }
    val d0 = df.na.drop("all", on).na.drop("any", Seq(labelCol))
    val (d, ord) = withOrd(d0, ordCol)
    val (labeled, labelMap) = df.schema(labelCol).dataType match {
      case StringType =>
        // first-appearance rank of each distinct label, fully distributed:
        // min(ord) per label, then a dense global index over those minima
        val firsts = d.groupBy(col(labelCol)).agg(min(col(ord)).as("__first"))
        val mapping = graft.core.Prefix.globalIndex(firsts, Seq(col("__first")), "label_id")
          .select(col(labelCol), col("label_id"))
        (d.join(mapping, Seq(labelCol))
          .withColumn(labelCol, col("label_id")).drop("label_id"),
          mapping.withColumnRenamed(labelCol, "label"))
      case _: FloatType | _: DoubleType =>
        val m = d.select(col(labelCol).cast("int").as("label")).distinct()
          .withColumn("label_id", col("label"))
        (d.withColumn(labelCol, col(labelCol).cast("int")), m)
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        val m = d.select(col(labelCol).as("label")).distinct()
          .withColumn("label_id", col("label"))
        (d, m)
      case other => throw new IllegalArgumentException(
        s"Label column $labelCol is not an int, float or string (got $other).")
    }
    val asStrings = on.foldLeft(labeled)((acc, c) => acc.withColumn(c, col(c).cast("string")))
    (asStrings.withColumn("text", serialized(asStrings, on, sep)), labelMap)
  }

  /** Train/eval/test row split (reference: train_clf_model.py:train_test_dev_split,
    * 15/15/70 by default) as a deterministic hash bucket on `keyCol` instead of
    * two chained seed-fixed `train_test_split`s.
    */
  def trainTestDevSplit(
      df: DataFrame, keyCol: String,
      testPct: Int = 15, evalPct: Int = 15): DataFrame = {
    require(testPct + evalPct < 100, "test+eval must leave room for train")
    val bucket = pmod(xxhash64(col(keyCol)), lit(100))
    df.withColumn("split",
      when(bucket < 100 - testPct - evalPct, "train")
        .when(bucket < 100 - testPct, "eval")
        .otherwise("test"))
  }

  /** `prep_linkage_data` (reference: preprocess.py:438-623): unlabeled pairs
    * are all positives — edges → connected components → split whole clusters,
    * member lists for train, (query=left_text, corpus=right_text) IR-eval for
    * val/test.
    */
  def prepLinkageData(
      df: DataFrame, leftCols: Seq[String], rightCols: Seq[String],
      leftId: Seq[String] = Nil, rightId: Seq[String] = Nil,
      valPct: Int = 20, testAtEnd: Boolean = true,
      ordCol: Option[String] = None, sep: String = Serialize.DefaultSep): LinkagePrep = {
    val prepared0 = checkAndPrepData(df, leftCols, rightCols, leftId, rightId, None, ordCol, sep)
    val edges = prepared0
      .select((col("__lgid") * 2).as("__src"), (col("__rgid") * 2 + 1).as("__dst"))
    val nodes = edges.select(col("__src").as("id")).union(edges.select(col("__dst"))).distinct()
    val comps = Clustering.connectedComponents(nodes, edges)
    val prepared = prepared0
      .join(comps.withColumnRenamed("id", "__src").withColumnRenamed("component", "cluster_assignment"),
        expr("__src = __lgid * 2"))
      // split whole clusters, not rows (preprocess.py:553-561)
      .withColumn("__split", splitCol(col("cluster_assignment"), valPct, testAtEnd))
      .localCheckpoint(true)
    val members = TrainPrep.clusterMembers(
      prepared.filter(col("__split") === "train")
        .select(col("cluster_assignment"), col("left_text").as("t"))
        .union(prepared.filter(col("__split") === "train")
          .select(col("cluster_assignment"), col("right_text"))),
      "cluster_assignment", Seq("t"), sep)
      .withColumnRenamed("cluster", "cluster_assignment")
    def ir(split: String): IrEval = {
      val part = prepared.filter(col("__split") === split)
      IrEval(
        part.select(col("left_id").as("qid"), col("left_text").as("text")).distinct(),
        part.select(col("right_id").as("did"), col("right_text").as("text")).distinct(),
        part.select(col("left_id").as("qid"), col("right_id").as("did")).distinct())
    }
    LinkagePrep(members, ir("val"), if (testAtEnd) Some(ir("test")) else None)
  }
}
