package graft.operators

import graft.embed.Embedder
import graft.core.{Keys, Serialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed clustering over embedding vectors (the engine's semantic GROUP BY).
  *
  * The reference's default clusterer ("SLINK", which is actually sklearn DBSCAN with
  * eps=1-threshold on cosine distance — reference: src/linktransformer/cluster_fns.py:8-78)
  * is re-expressed as: ε-similarity graph (range self-join on cosine >= 1-eps) →
  * connected components → density/noise relabeling. Exact single-linkage, fully
  * distributed — no driver-side materialization (SURVEY §7.4 point 7).
  */
object Clustering {

  /** Connected components by iterative min-label propagation over a DataFrame
    * edge list `(src, dst)` (both directions need not be present; we symmetrize).
    * Returns `(id, component)` where `component` = min node id reachable.
    *
    * Replaces networkx.connected_components (reference: cluster_fns.py:81-93).
    * Each iteration is one shuffle on `id`; iterations = O(graph diameter), with
    * persistence + local checkpointing to keep lineage bounded at scale.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.select(col(nodes.columns.head).cast("long").as("id")).distinct()
    val e0 = edges.select(
      col(edges.columns(0)).cast("long").as("src"),
      col(edges.columns(1)).cast("long").as("dst"))
    // materialize the (symmetrized) edge list once and truncate its lineage —
    // every iteration reuses it without re-deriving the similarity self-join
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    var labels = n.withColumn("component", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      // candidate label for each node: min over neighbors' labels and own.
      // localCheckpoint keeps the per-iteration plan constant-size (otherwise
      // the lineage — and driver heap — grows geometrically with iterations).
      val fromNeighbors = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(fromNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") < col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** DBSCAN-equivalent over a vector column, exact for cosine metric.
    *
    * `eps` is cosine DISTANCE (1 - similarity), `minSamples` counts the point
    * itself (sklearn semantics). Core points form clusters via connected
    * components of the core-core ε-graph; border points join the minimum-labeled
    * core neighbor's cluster (deterministic — sklearn is order-dependent here,
    * documented divergence); noise gets cluster -1. Cluster labels are the min
    * member id of each cluster's core set (stable, join-friendly).
    * Reference semantics: cluster_fns.py:52-78 ("SLINK"/DBSCAN branch).
    */
  def dbscanCosine(
      df: DataFrame, idCol: String, vecCol: String,
      eps: Double, minSamples: Int = 2): DataFrame = {
    import graft.functions.VectorOps._
    val tau = 1.0 - eps
    val pts = df.select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ε-neighbor pairs (i != j), both directions retained by symmetry of the
    // predicate; checkpointed so downstream stages never re-run the self-join
    val a = pts.select(col("id").as("i"), col("v").as("vi"), col("nrm").as("ni"))
    val b = pts.select(col("id").as("j"), col("v").as("vj"), col("nrm").as("nj"))
    val nbrs = a.join(b, col("i") =!= col("j"))
      .filter(cosineWithNorms(dot(col("vi"), col("vj")), col("ni"), col("nj")) >= lit(tau))
      .select("i", "j")
      .localCheckpoint(true)

    // core = |neighbors incl. self| >= minSamples
    val degrees = nbrs.groupBy(col("i").as("id")).agg((count("*") + 1).as("deg"))
    val core = pts.select("id").join(degrees, Seq("id"), "left")
      .select(col("id"), (coalesce(col("deg"), lit(1L)) >= minSamples).as("is_core"))
      .localCheckpoint(true)

    val coreIds = core.filter(col("is_core")).select("id")
    val coreEdges = nbrs
      .join(coreIds.withColumnRenamed("id", "i"), Seq("i"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "j"), Seq("j"), "left_semi")
    val coreLabels = connectedComponents(coreIds, coreEdges.select("i", "j"))

    // border points: non-core with >=1 core neighbor -> min core neighbor's label
    val borderLabels = nbrs
      .join(core.filter(!col("is_core")).select(col("id").as("i")), Seq("i"), "left_semi")
      .join(coreLabels.withColumnRenamed("id", "j"), Seq("j"))
      .groupBy(col("i").as("id")).agg(min("component").as("component"))

    val labeled = coreLabels.union(borderLabels)
    pts.select("id").join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), lit(-1L)).as("cluster"))
  }

  /** Pure ε-graph single-linkage clustering (no density requirement): connected
    * components of the cosine >= tau graph; singletons are their own cluster.
    * The distributed backend for near-dup detection.
    */
  def epsilonCluster(df: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.VectorOps._
    val pts = df.select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = pts.select(col("id").as("i"), col("v").as("vi"), col("nrm").as("ni"))
    val b = pts.select(col("id").as("j"), col("v").as("vj"), col("nrm").as("nj"))
    val edges = a.join(b, col("i") < col("j"))
      .filter(cosineWithNorms(dot(col("vi"), col("vj")), col("ni"), col("nj")) >= lit(tau))
      .select("i", "j")
    connectedComponents(pts.select("id"), edges)
      .withColumnRenamed("component", "cluster")
  }

  /** `cluster_rows` — embed serialized key columns, cluster, attach `cluster` col
    * (reference: src/linktransformer/infer.py:377-438).
    */
  def clusterRows(
      df: DataFrame, on: Seq[String], embedder: Embedder,
      threshold: Double = 0.5, minClusterSize: Int = 2,
      sep: String = Serialize.DefaultSep): DataFrame = {
    Keys.requireNoReserved(df, Seq("__graft_id", "__graft_text", "__graft_vec", "cluster"))
    val withId = df.withColumn("__graft_id", monotonically_increasing_id())
    val withText = withId.withColumn("__graft_text",
      Serialize.serializeColumns(on.map(withId(_)), sep))
    // checkpoint: the frame branches into the clusterer and the label join-back;
    // row ids must be assigned exactly once (see SemanticJoin.withTextVec)
    val emb = embedder.embed(withText, "__graft_text", "__graft_vec").localCheckpoint(true)
    val labels = dbscanCosine(emb, "__graft_id", "__graft_vec",
      eps = 1.0 - threshold, minSamples = minClusterSize)
    emb.drop("__graft_text", "__graft_vec")
      .join(labels.withColumnRenamed("id", "__graft_id"), Seq("__graft_id"))
      .drop("__graft_id")
  }

  /** `dedup_rows` — exact-dup drop, semantic cluster, keep one row per cluster
    * (reference: infer.py:444-485). Keep-first follows min original row id;
    * noise rows (cluster -1) are all kept.
    */
  def dedupRows(
      df: DataFrame, on: Seq[String], embedder: Embedder,
      threshold: Double = 0.55, minClusterSize: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Keys.requireNoReserved(df, Seq("__graft_ord"))
    val withOrd = df.withColumn("__graft_ord", monotonically_increasing_id())
    // exact-duplicate drop, keep first (reference: infer.py:477 keep="first")
    val exactW = Window.partitionBy(on.map(col): _*).orderBy(col("__graft_ord"))
    val exact = withOrd.withColumn("__rn", row_number().over(exactW))
      .filter(col("__rn") === 1).drop("__rn")
    val clustered = clusterRows(exact, on, embedder, threshold, minClusterSize)
    val w = Window.partitionBy(col("cluster")).orderBy(col("__graft_ord"))
    clustered
      .withColumn("__rn", row_number().over(w))
      .filter(col("cluster") === -1 || col("__rn") === 1)
      .drop("__rn", "cluster", "__graft_ord")
  }

  /** All intra-cluster pairs (i < j) from a `(id, cluster)` assignment
    * (reference: cluster_fns.py:96-106).
    */
  def edgesFromClusters(assign: DataFrame, idCol: String, clusterCol: String): DataFrame = {
    val x = assign.select(col(clusterCol).as("c"), col(idCol).as("id1"))
    val y = assign.select(col(clusterCol).as("c"), col(idCol).as("id2"))
    x.join(y, "c").filter(col("id1") < col("id2")).select("id1", "id2", "c")
  }
}
