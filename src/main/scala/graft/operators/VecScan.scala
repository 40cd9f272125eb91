package graft.operators

import graft.functions.TopKBuffer
import graft.functions.VectorOps.asDouble
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast-matrix similarity scan — the physical kernel behind the kNN and
  * range joins when the right side fits in memory (SURVEY §4.3: "small right:
  * broadcast right (id, vec) matrix, mapPartitions top-k per left row").
  *
  * Versus the crossJoin formulation this removes all per-pair row machinery:
  * the pair space exists only as two nested primitive loops inside a partition,
  * each left row allocates nothing but its TopK buffer, and only ≤k (or
  * ≥τ-matching) rows are ever materialized. Scores are bit-identical to the
  * declarative path: same `dot / (sqrt(na)·sqrt(nb))` double op order, same
  * [-1,1] clamp, same (score desc, id asc) tie-break.
  *
  * Scale posture: the scan distributes over left partitions with zero shuffle;
  * the broadcast is bounded by [[VecScan.maxBroadcastBytes]] and callers fall
  * back to the shuffle/crossJoin plan (or IVF) above that.
  */
object VecScan {

  /** Right side must stay under this to take the broadcast path. The default
    * (256 MiB of packed doubles) leaves headroom under Spark's default
    * `spark.driver.maxResultSize=1g`: [[collectMat]] pulls the matrix through
    * the driver, so a bound near 1 GiB kills the job with a confusing
    * driver-side error instead of falling back to the shuffle plan. Tune with
    * `spark.graft.vecscan.maxBroadcastBytes` (raise it together with
    * maxResultSize / driver memory).
    */
  val DefaultMaxBroadcastBytes: Long = 256L << 20
  val MaxBroadcastBytesKey = "spark.graft.vecscan.maxBroadcastBytes"

  def maxBroadcastBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(MaxBroadcastBytesKey).map(_.toLong).getOrElse(DefaultMaxBroadcastBytes)

  private[graft] final case class Mat(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double])

  private[graft] def collectMat(df: DataFrame, idCol: String, vecCol: String): Mat = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Array[Double])].collect()
    val ids = new Array[Long](rows.length)
    val vecs = new Array[Array[Double]](rows.length)
    val norms = new Array[Double](rows.length)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i)._1
      vecs(i) = rows(i)._2
      norms(i) = math.sqrt(dot(rows(i)._2, rows(i)._2))
      i += 1
    }
    Mat(ids, vecs, norms)
  }

  @inline private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Same clamp as VectorOps.cosine: least(greatest(d/(na*nb), -1), 1). */
  @inline private[graft] def cosine(d: Double, na: Double, nb: Double): Double =
    math.min(math.max(d / (na * nb), -1.0), 1.0)

  /** True if the right side is small enough (rows × dim × 8 bytes). One job:
    * count and dim come from a single aggregate.
    */
  def fitsBroadcast(right: DataFrame, vecCol: String, dim: => Int = 0): Boolean = {
    val bound = maxBroadcastBytes(right.sparkSession)
    if (dim > 0) {
      right.count() * dim.toLong * 8L <= bound
    } else {
      val r = right.agg(count(lit(1)), first(size(col(vecCol)), ignoreNulls = true)).first()
      val n = r.getLong(0)
      val d = if (r.isNullAt(1)) 1 else math.max(r.getInt(1), 1)
      n * d.toLong * 8L <= bound
    }
  }

  /** kNN scan: `(left_id, right_id, score, rank)`, rank 1-based best-first,
    * ≤k rows per left row.
    */
  def knn(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      k: Int, excludeSelf: Boolean): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val mat = spark.sparkContext.broadcast(collectMat(right, rightId, rightVec))
    val out = left.select(col(leftId).cast("long"), asDouble(col(leftVec)))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = mat.value
        it.flatMap { case (lid, lv) =>
          val ln = math.sqrt(dot(lv, lv))
          val buf = new TopKBuffer(k)
          var j = 0
          while (j < m.ids.length) {
            if (!(excludeSelf && m.ids(j) == lid)) {
              buf.insert(cosine(dot(lv, m.vecs(j)), ln, m.norms(j)), m.ids(j))
            }
            j += 1
          }
          (0 until buf.n).map(r => (lid, buf.ids(r), buf.scores(r), r + 1))
        }
      }
    out.toDF("left_id", "right_id", "score", "rank")
  }

  /** Range scan: matching `(left_id, right_id, score)` pairs with score ≥ τ.
    * `onlyUpperPairs` emits i<j once (self-join edge lists for clustering).
    */
  def range(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      tau: Double, excludeSelf: Boolean, onlyUpperPairs: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val mat = spark.sparkContext.broadcast(collectMat(right, rightId, rightVec))
    val out = left.select(col(leftId).cast("long"), asDouble(col(leftVec)))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = mat.value
        it.flatMap { case (lid, lv) =>
          val ln = math.sqrt(dot(lv, lv))
          val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = 0
          while (j < m.ids.length) {
            val rid = m.ids(j)
            val keep = if (onlyUpperPairs) lid < rid
              else !(excludeSelf && rid == lid)
            if (keep) {
              val s = cosine(dot(lv, m.vecs(j)), ln, m.norms(j))
              if (s >= tau) hits += ((lid, rid, s))
            }
            j += 1
          }
          hits
        }
      }
    out.toDF("left_id", "right_id", "score")
  }
}
