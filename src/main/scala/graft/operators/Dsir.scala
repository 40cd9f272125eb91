package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling of a raw corpus toward a
  * target distribution (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling", public method): fit add-α-smoothed
  * bag-of-hashed-tokens unigram models on the target sample and the raw
  * corpus, weight each raw document by the log likelihood ratio
  * `Σ_b c_b(doc)·(ln p_target[b] − ln p_raw[b])`, and keep the top-n by
  * weight (+ an optional deterministic Gumbel perturbation, which makes the
  * selection a sample from the softmax over weights rather than a hard
  * arg-top-n — the paper's actual sampler).
  *
  * Everything is md5-derived and order-pinned, so the whole pipeline —
  * feature hashing, smoothing, per-doc log-ratio fold, Gumbel noise, final
  * top-n — is bit-reproducible by any engine with md5 (`q_dsir` hash-checks
  * it against DuckDB): the per-doc sum folds bucket contributions in bucket
  * order via the native ordered-sum aggregate (one value per distinct
  * bucket, so there are no ties and the fold order is total).
  *
  * Scale shape (100 TB): two B-bounded bucket-count aggregates (B = buckets,
  * e.g. 10⁴ — tiny), the per-bucket log-ratio table broadcast; per-doc
  * weights are explode → (doc, bucket) partial-agg count → broadcast join →
  * ordered-sum per doc (one shuffle keyed by doc); selection is
  * `orderBy(...).limit(n)` = TakeOrderedAndProject (per-partition top-n,
  * never a global sort). No windows, no driver state.
  */
object Dsir {

  /** uint32(md5(token || '#' || seed)) mod buckets — the shared
    * [[graft.functions.DetHash]] convention with the bucket count as the
    * modulus (same md5 kernel as [[Sampling.deterministicSampleMd5]]).
    */
  private def md5Bucket(tok: Column, buckets: Int, seed: Long): Column =
    graft.functions.DetHash.md5Bucket(tok, seed, buckets.toLong)

  /** Lowercased whitespace tokens, empties dropped (repo convention). */
  private def toks(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** Hashed-token bucket counts `(bucket, cnt)` over a corpus — the
    * sufficient statistic for one side's unigram model. One explode + one
    * partial-agg count; output ≤ `buckets` rows.
    */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int, seed: Long = 42L): DataFrame =
    df.select(explode(toks(col(textCol))).as("__tok"))
      .select(md5Bucket(col("__tok"), buckets, seed).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document importance weight of `raw` toward `target`:
    * `(idCol, weight)` with
    * `weight = Σ_b c_b(doc) · (ln((t_b+α)/(T+αB)) − ln((r_b+α)/(R+αB)))`
    * — positive means "looks more like the target than like the raw corpus".
    * Documents with no tokens get weight 0.0. Buckets unseen on either side
    * still contribute through the smoothing mass, as the paper's estimator
    * requires.
    */
  def importanceWeights(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 1024, alpha: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    // the two model sides are B-bounded aggregates (≤ `buckets` rows each —
    // the entire point of hashed features), so the per-bucket log-ratio
    // table is assembled on the DRIVER from two bounded collects instead of
    // four tiny distributed aggregates + two scalar cross joins: at bench
    // scale that halves the search's AQE job count (each micro-aggregate
    // was a scheduler round-trip), and at 100 TB it changes nothing — the
    // collects carry ≤ B rows regardless of corpus size. Doubles are
    // bit-identical to the former in-plan expression: same casts, same
    // `alpha · B` literal, same divide/log/subtract order (Catalyst's Log
    // IS java.lang.Math.log).
    // cap sized from driver-heap bytes, not rows (advisor r8): each side
    // collects ≤ `buckets` GenericRows of (long, long) at ~100 bytes of JVM
    // object overhead apiece, so 2^20 buckets ≈ 2 × 100 MB worst-case —
    // already generous; the old 2^24 row cap allowed multi-GB collects. The
    // paper's regime is B ≈ 10^4; anything near the cap is misuse.
    require(buckets <= (1 << 20),
      s"buckets must be <= ${1 << 20} (one side-tagged collect of ~100 bytes/bucket " +
        s"across both sides — ~200 MB at the cap), got $buckets")
    val spark = raw.sparkSession
    // ONE collect for both model sides (was two): a side-tagged union makes
    // the two B-bounded aggregates a single Spark job, so their scans run
    // CONCURRENTLY and the driver pays one scheduler round-trip instead of
    // two sequential ones (guide §2.6 — overlap independent work). Counts
    // are exact longs either way; the double math below is unchanged.
    val both = bucketCounts(raw, textCol, buckets, seed)
      .select(col("bucket"), col("cnt"), lit(0).as("__side"))
      .unionByName(bucketCounts(target, targetTextCol, buckets, seed)
        .select(col("bucket"), col("cnt"), lit(1).as("__side")))
      .collect()
    val tMap = both.iterator.filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rRows = both.iterator.filter(_.getInt(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toArray
    val tt = tMap.values.sum
    val rt = rRows.map(_._2).sum
    val alphaB = alpha * buckets
    // raw-side buckets are a superset of any bucket a raw doc can hit, so
    // the ratio table only needs rows for them (the former left join)
    val lrRows = rRows.map { case (b, rc) =>
      (b,
        math.log((tMap.getOrElse(b, 0L).toDouble + alpha) / (tt.toDouble + alphaB)) -
          math.log((rc.toDouble + alpha) / (rt.toDouble + alphaB)))
    }.toSeq
    import spark.implicits._
    val lr = lrRows.toDF("bucket", "__lr")
    // per-(doc, bucket) counts, then contribution = cnt · lr — one exact
    // product per distinct bucket, folded in bucket order (no ties → total
    // order → deterministic double sum)
    val docBuckets = raw
      .select(col(idCol).cast("long").as("__id"), explode(toks(col(textCol))).as("__tok"))
      .select(col("__id"), md5Bucket(col("__tok"), buckets, seed).as("bucket"))
      .groupBy("__id", "bucket").agg(count(lit(1)).cast("double").as("__c"))
    val weights = docBuckets.join(broadcast(lr), "bucket")
      .select(col("__id"), col("bucket"), (col("__c") * col("__lr")).as("__contrib"))
      .groupBy("__id")
      // ordered-sum key is a string; byte-lexicographic bucket order is a
      // total order over distinct buckets (the oracle folds by the same
      // `ORDER BY CAST(bucket AS VARCHAR)` — ASCII digits memcmp the same
      // way in both engines), which is all determinism needs
      .agg(graft.functions.VecExpressions
        .orderedSum(col("bucket").cast("string"), col("__contrib")).as("weight"))
    // tokenless docs never reach the explode: join them back at weight 0.
    // No distinct() on the id projection — doc ids are unique by the
    // operator's contract (a dup id would already double-count its tokens in
    // the models above), and a distinct here is a full-corpus shuffle+agg
    // spent proving it. The join itself is id-keyed on both sides — one
    // co-partitioned shuffle each, the minimum any total zero-fill costs.
    raw.select(col(idCol).cast("long").as("__id"))
      .join(weights, Seq("__id"), "left")
      .select(col("__id").as(idCol), coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** Deterministic Gumbel(0,1) noise from the md5 millionths bucket of the
    * id — delegates to the shared [[graft.functions.DetHash.gumbelNoise]]
    * convention (kept here as the public name the sampler's callers use).
    */
  def gumbelNoise(id: Column, seed: Long): Column =
    graft.functions.DetHash.gumbelNoise(id, seed)

  /** Select `n` documents by importance weight. With `gumbel` (the paper's
    * sampler) each doc's key is `weight + Gumbel(0,1)` — a softmax sample
    * without replacement; without it, the hard top-n. Ties break by id;
    * `orderBy(...).limit(n)` compiles to per-partition top-n + merge, never
    * a global sort.
    */
  def resampleTop(
      weights: DataFrame, idCol: String, n: Int,
      gumbel: Boolean = true, seed: Long = 7L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val keyed =
      if (gumbel) weights.withColumn("__key", col("weight") + gumbelNoise(col(idCol), seed))
      else weights.withColumn("__key", col("weight"))
    keyed.orderBy(col("__key").desc, col(idCol)).limit(n).drop("__key")
  }
}
