package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side hierarchical clusterers: agglomerative (NN-chain + Lance-Williams)
  * and HDBSCAN (mutual-reachability MST → condensed tree → excess-of-mass).
  *
  * These mirror the reference's non-default clusterer branches
  * (reference: src/linktransformer/cluster_fns.py:8-78 — "agglomerative" via
  * sklearn AgglomerativeClustering with distance_threshold, "HDBScan" via the
  * hdbscan library). Both are inherently global algorithms with no exact
  * distributed formulation, so — like the reference, whose datasets for these
  * paths are small — they collect the vectors to the driver behind explicit
  * size guards (SURVEY §7.4 point 7: the two fenced exceptions). The
  * distributed scale path for clustering remains [[Clustering.dbscanCosine]] /
  * [[Clustering.epsilonCluster]].
  *
  * Cluster labels follow the engine convention: label = min original id of the
  * cluster's members; HDBSCAN noise = -1.
  */
object HierarchicalClustering {

  /** Row guards: agglomerative holds an O(n²) double matrix (~800 MB at the
    * limit); HDBSCAN is O(n) memory but O(n²) time.
    */
  val MaxAgglomRows = 10000
  val MaxHdbscanRows = 30000

  private def collectVectors(
      df: DataFrame, idCol: String, vecCol: String,
      limit: Int, opName: String): (Array[Long], Array[Array[Double]]) = {
    import graft.functions.VectorOps.asDouble
    val n = df.count()
    require(n <= limit,
      s"$opName is a driver-side operator guarded at $limit rows (got $n); " +
        "use Clustering.dbscanCosine/epsilonCluster for the distributed path")
    val rows = df.select(col(idCol).cast("long"), asDouble(col(vecCol))).collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    (ids, vecs)
  }

  private def euclidean(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private def cosineDist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    1.0 - math.min(1.0, math.max(-1.0, c))
  }

  private def distFn(metric: String): (Array[Double], Array[Double]) => Double =
    metric match {
      case "euclidean" => euclidean
      case "cosine"    => cosineDist
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }

  // -------------------------------------------------------------- agglomerative

  /** Agglomerative clustering with a distance threshold, NN-chain algorithm
    * (O(n²) time/memory, exact for the reducible linkages below).
    *
    * `linkage`: "single" | "complete" | "average" | "ward" (ward requires
    * euclidean, as in sklearn). Merges stop at `distanceThreshold` — clusters
    * whose linkage distance is >= the threshold are not merged (sklearn
    * `distance_threshold` semantics). Returns `(id, cluster)`.
    */
  def agglomerative(
      df: DataFrame, idCol: String, vecCol: String,
      distanceThreshold: Double,
      linkage: String = "average",
      metric: String = "cosine"): DataFrame = {
    require(linkage != "ward" || metric == "euclidean", "ward requires euclidean metric")
    val (ids, vecs) = collectVectors(df, idCol, vecCol, MaxAgglomRows, "agglomerative")
    val n = ids.length
    val spark = df.sparkSession
    if (n == 0) return emptyAssignment(spark)
    val d = distFn(metric)
    val ward = linkage == "ward"

    // condensed-to-flat n×n matrix; ward stores SQUARED euclidean (the
    // Lance-Williams ward update is expressed over squared distances)
    val m = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dij = d(vecs(i), vecs(j))
        val v = if (ward) dij * dij else dij
        m(i)(j) = v; m(j)(i) = v
        j += 1
      }
      i += 1
    }

    val active = Array.fill(n)(true)
    val size = Array.fill(n)(1L)
    // merge log: (repA, repB, height in metric units)
    val merges = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double)](n - 1)
    val chain = new Array[Int](n + 1)
    var chainLen = 0
    var remaining = n
    var scanFrom = 0

    while (remaining > 1) {
      if (chainLen == 0) {
        while (!active(scanFrom)) scanFrom += 1
        chain(0) = scanFrom; chainLen = 1
      }
      val top = chain(chainLen - 1)
      // nearest active neighbor of `top` (lowest index wins ties — deterministic)
      var best = -1; var bestD = Double.MaxValue
      var c = 0
      while (c < n) {
        if (active(c) && c != top && m(top)(c) < bestD) { bestD = m(top)(c); best = c }
        c += 1
      }
      if (chainLen >= 2 && best == chain(chainLen - 2)) {
        // reciprocal pair -> merge top into best's slot (keep lower index as rep)
        val a = math.min(top, best); val b = math.max(top, best)
        val height = if (ward) math.sqrt(bestD) else bestD
        merges += ((a, b, height))
        val na = size(a); val nb = size(b)
        var k = 0
        while (k < n) {
          if (active(k) && k != a && k != b) {
            val dka = m(k)(a); val dkb = m(k)(b)
            val nk = size(k)
            val nd = linkage match {
              case "single"   => math.min(dka, dkb)
              case "complete" => math.max(dka, dkb)
              case "average"  => (na * dka + nb * dkb) / (na + nb)
              case "ward" =>
                ((na + nk) * dka + (nb + nk) * dkb - nk * m(a)(b)) / (na + nb + nk)
            }
            m(k)(a) = nd; m(a)(k) = nd
          }
          k += 1
        }
        active(b) = false
        size(a) = na + nb
        remaining -= 1
        chainLen -= 2
      } else {
        chain(chainLen) = best; chainLen += 1
      }
    }

    // cut the dendrogram: union every merge with height < threshold (linkage
    // heights are monotone for these linkages, so this is exactly the cut)
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    merges.foreach { case (a, b, h) =>
      if (h < distanceThreshold) {
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val minId = new java.util.HashMap[java.lang.Integer, java.lang.Long]()
    i = 0
    while (i < n) {
      val r = java.lang.Integer.valueOf(find(i))
      val cur = minId.get(r)
      if (cur == null || ids(i) < cur.longValue()) minId.put(r, ids(i))
      i += 1
    }
    val out = (0 until n).map(i => (ids(i), minId.get(java.lang.Integer.valueOf(find(i))).longValue()))
    toAssignment(spark, out)
  }

  // -------------------------------------------------------------------- hdbscan

  /** HDBSCAN (excess-of-mass cluster extraction, `allow_single_cluster=false`):
    * core distances (k = minSamples, self included as in the hdbscan library) →
    * mutual-reachability distances → Prim MST → single-linkage hierarchy →
    * condensed tree at `minClusterSize` → stability-maximizing selection.
    * Noise → cluster -1. Returns `(id, cluster)`.
    */
  def hdbscan(
      df: DataFrame, idCol: String, vecCol: String,
      minClusterSize: Int = 5,
      minSamples: Int = -1,
      metric: String = "cosine"): DataFrame = {
    val mcs = math.max(2, minClusterSize)
    val k = if (minSamples > 0) minSamples else mcs
    val (ids, vecs) = collectVectors(df, idCol, vecCol, MaxHdbscanRows, "hdbscan")
    val n = ids.length
    val spark = df.sparkSession
    if (n == 0) return emptyAssignment(spark)
    if (n < mcs) return toAssignment(spark, ids.map(id => (id, -1L)).toSeq)
    val d = distFn(metric)

    // core distance: k-th smallest of the distance row, self (0.0) included —
    // matches hdbscan's knn_dist[:, min_samples-1] with self at column 0
    val core = new Array[Double](n)
    val row = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { row(j) = if (i == j) 0.0 else d(vecs(i), vecs(j)); j += 1 }
      val sorted = row.clone(); java.util.Arrays.sort(sorted)
      core(i) = sorted(math.min(k - 1, n - 1))
      i += 1
    }

    // Prim MST over mutual reachability max(core_i, core_j, d_ij); O(n²), O(n) mem
    val inTree = Array.fill(n)(false)
    val bestDist = Array.fill(n)(Double.MaxValue)
    val bestFrom = Array.fill(n)(-1)
    val mstA = new Array[Int](n - 1); val mstB = new Array[Int](n - 1)
    val mstW = new Array[Double](n - 1)
    inTree(0) = true
    var cur = 0
    var e = 0
    while (e < n - 1) {
      var j = 0
      while (j < n) {
        if (!inTree(j)) {
          val mr = math.max(math.max(core(cur), core(j)), d(vecs(cur), vecs(j)))
          if (mr < bestDist(j)) { bestDist(j) = mr; bestFrom(j) = cur }
        }
        j += 1
      }
      var next = -1; var nd = Double.MaxValue
      j = 0
      while (j < n) { if (!inTree(j) && bestDist(j) < nd) { nd = bestDist(j); next = j }; j += 1 }
      mstA(e) = bestFrom(next); mstB(e) = next; mstW(e) = nd
      inTree(next) = true; cur = next; e += 1
    }

    // single-linkage dendrogram: process MST edges ascending; internal nodes
    // n..2n-2 with (leftChild, rightChild, height, size)
    val order = (0 until n - 1).sortBy(mstW)
    val parent = Array.tabulate(2 * n - 1)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    val nodeOf = Array.tabulate(2 * n - 1)(identity) // root-rep -> dendrogram node
    val left = new Array[Int](2 * n - 1); val right = new Array[Int](2 * n - 1)
    val height = new Array[Double](2 * n - 1); val nsize = Array.fill(2 * n - 1)(1)
    var nextNode = n
    order.foreach { ei =>
      val ra = find(mstA(ei)); val rb = find(mstB(ei))
      val na = nodeOf(ra); val nb = nodeOf(rb)
      left(nextNode) = na; right(nextNode) = nb
      height(nextNode) = mstW(ei)
      nsize(nextNode) = nsize(na) + nsize(nb)
      parent(ra) = rb
      nodeOf(find(rb)) = nextNode
      nextNode += 1
    }
    val root = 2 * n - 2

    // condensed tree: split spawns two child clusters only when both sides have
    // >= mcs points; smaller sides' points fall out of the current cluster at
    // λ = 1/height
    def lam(h: Double): Double = 1.0 / math.max(h, 1e-12)
    val clParent = new scala.collection.mutable.ArrayBuffer[Int]()   // condensed parent
    val clBirth = new scala.collection.mutable.ArrayBuffer[Double]()
    val clStability = new scala.collection.mutable.ArrayBuffer[Double]()
    clParent += -1; clBirth += 0.0; clStability += 0.0 // root cluster 0
    val ptCluster = new Array[Int](n)   // condensed cluster each point fell out of
    // stack of (dendrogram node, condensed cluster id)
    val stack = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    stack += ((root, 0))
    def leavesOf(node0: Int): Seq[Int] = {
      // iterative: dendrograms can be chain-shaped (depth O(n))
      val out = new scala.collection.mutable.ArrayBuffer[Int]()
      var todo = List(node0)
      while (todo.nonEmpty) {
        val x = todo.head; todo = todo.tail
        if (x < n) out += x else todo = left(x) :: right(x) :: todo
      }
      out.toSeq
    }
    while (stack.nonEmpty) {
      val (node, cl) = stack.remove(stack.length - 1)
      if (node < n) {
        // unreachable for mcs >= 2 (no size-1 node passes a split guard);
        // kept for safety
        ptCluster(node) = cl
      } else {
        val l0 = left(node); val r0 = right(node)
        val lSize = nsize(l0); val rSize = nsize(r0)
        val lambda = lam(height(node))
        if (lSize >= mcs && rSize >= mcs) {
          // true split: two new condensed clusters born here
          Seq(l0, r0).foreach { child =>
            val id = clParent.length
            clParent += cl; clBirth += lambda; clStability += 0.0
            clStability(cl) += nsize(child) * (lambda - clBirth(cl))
            stack += ((child, id))
          }
        } else {
          // points of sub-mcs side(s) fall out at λ; a >=mcs side continues `cl`
          Seq(l0, r0).foreach { child =>
            if (nsize(child) >= mcs) stack += ((child, cl))
            else leavesOf(child).foreach { p =>
              ptCluster(p) = cl
              clStability(cl) += lambda - clBirth(cl)
            }
          }
        }
      }
    }

    // excess-of-mass selection, root never selectable (allow_single_cluster=false)
    val nc = clParent.length
    val children = Array.fill(nc)(List.empty[Int])
    var c = nc - 1
    while (c >= 1) { children(clParent(c)) ::= c; c -= 1 }
    val selected = Array.fill(nc)(false)
    val score = new Array[Double](nc)
    c = nc - 1
    while (c >= 0) {
      val childSum = children(c).map(score).sum
      if (c == 0) { score(c) = childSum }
      else if (children(c).isEmpty || clStability(c) >= childSum) {
        selected(c) = true
        score(c) = clStability(c)
        // deselect entire subtree below
        var sub = children(c)
        while (sub.nonEmpty) {
          val x = sub.head; sub = sub.tail
          selected(x) = false; sub = children(x) ++ sub
        }
      } else score(c) = childSum
      c -= 1
    }

    // each point: nearest selected ancestor-or-self of the cluster it fell from
    val label = new Array[Long](n)
    i = 0
    while (i < n) {
      var cl = ptCluster(i)
      while (cl >= 0 && !selected(cl)) cl = clParent(cl)
      label(i) = cl.toLong // provisional: condensed id or -1
      i += 1
    }
    // remap selected clusters to min member id
    val minId = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    i = 0
    while (i < n) {
      if (label(i) >= 0) {
        val cur = minId.get(java.lang.Long.valueOf(label(i)))
        if (cur == null || ids(i) < cur.longValue()) minId.put(label(i), ids(i))
      }
      i += 1
    }
    val out = (0 until n).map { i =>
      (ids(i), if (label(i) < 0) -1L else minId.get(java.lang.Long.valueOf(label(i))).longValue())
    }
    toAssignment(spark, out)
  }

  private def toAssignment(spark: SparkSession, rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("id", "cluster")
  }

  private def emptyAssignment(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(Long, Long)].toDF("id", "cluster")
  }
}
