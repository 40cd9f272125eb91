package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy matching over SHORT strings — names,
  * titles, codes: the classic record-linkage companion to the embedding
  * joins. Candidate generation is symmetric-deletion blocking (the public
  * SymSpell scheme): if `dist(a, b) <= k` then deleting the unmatched
  * positions of an optimal alignment takes both strings to their common
  * subsequence, so their depth-k deletion neighborhoods intersect — an
  * equi-join on deletion variants finds EVERY qualifying pair, and a banded
  * `levenshtein(a, b, k)` verify trims the false positives. No recall loss,
  * ever: the blocking is a proven superset, unlike gram-count filters, and it
  * does not degenerate on long shared prefixes/suffixes (where q-gram df caps
  * silently drop the only discriminating grams — think `Customer#000000001`).
  *
  * Scale: a string of length L yields <= L+1 variants at k=1 and ~L²/2 at
  * k=2, so postings are `n · O(L^k)` rows — this is a SHORT-STRING operator
  * (guarded at `maxLen`); use the shingle/minhash family for documents. The
  * join key is `xxhash64(variant)` (8-byte shuffle keys instead of
  * near-full-length strings; hash collisions only ever ADD candidates, which
  * the verify removes). Per-pair candidate multiplicity is bounded by the
  * shared-variant count (<= variants per string, a function of L and k, never
  * of n), and the distinct that collapses it is a map-side-combinable
  * aggregate. Exact-duplicate-heavy inputs emit their quadratic qualifying
  * pairs like any pair enumerator — run [[Dedup.exact]] first, or use
  * [[fuzzyDedup]] whose `(id, cluster)` output stays linear.
  */
object Fuzzy {

  /** SQL fragment: all strings obtainable from `e` by deleting exactly one
    * character (plus `e` itself — depth-0), distinct. Composable: `e` may be
    * a lambda variable, which is what lets [[variantsExpr]] nest it.
    */
  private def delOnce(e: String): String =
    s"""concat(array($e), transform(sequence(1, greatest(length($e), 1)),
       |  i -> concat(substring($e, 1, i - 1), substring($e, i + 1, length($e)))))""".stripMargin

  /** Distinct deletion variants of `e` up to depth `k` (k in 1..2). */
  private def variantsExpr(e: String, k: Int): String = k match {
    case 1 => s"array_distinct(${delOnce(e)})"
    case 2 => s"array_distinct(flatten(transform(${delOnce(e)}, __v -> ${delOnce("__v")})))"
    case _ => throw new IllegalArgumentException(
      s"maxDist must be 1 or 2 (deletion neighborhoods grow as L^k), got $k")
  }

  /** `(id, vkey)` postings: one row per distinct deletion variant per string,
    * keyed by the variant's xxhash64.
    */
  private def postings(
      df: DataFrame, idCol: String, strCol: String, k: Int, maxLen: Int): DataFrame = {
    val s = col(strCol)
    val checked = when(s.isNull, lit(null))
      .when(length(s) > maxLen, raise_error(concat(
        lit(s"Fuzzy: '$strCol' longer than maxLen=$maxLen chars: "), s)))
      .otherwise(s)
    df.select(col(idCol).as("id"), checked.as("__s"))
      .filter(col("__s").isNotNull)
      .select(col("id"), explode(expr(variantsExpr("__s", k))).as("__v"))
      .select(col("id"), xxhash64(col("__v")).as("vkey"))
      .distinct()
  }

  /** Fuzzy two-table join: every `(left_id, right_id, dist)` with
    * `levenshtein(left, right) <= maxDist`. Null strings never match.
    */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int, maxLen: Int = 64): DataFrame = {
    val lp = postings(left, leftId, leftStr, maxDist, maxLen)
      .withColumnRenamed("id", "left_id")
    val rp = postings(right, rightId, rightStr, maxDist, maxLen)
      .withColumnRenamed("id", "right_id")
    val cand = lp.join(rp, "vkey").select("left_id", "right_id").distinct()
    cand
      .join(left.select(col(leftId).as("left_id"), col(leftStr).as("__l")), "left_id")
      .join(right.select(col(rightId).as("right_id"), col(rightStr).as("__r")), "right_id")
      .select(col("left_id"), col("right_id"),
        levenshtein(col("__l"), col("__r"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // banded levenshtein returns -1 above the bound
  }

  /** Fuzzy self-pairs: `(i, j, dist)` with `i < j` and dist <= maxDist. */
  def fuzzyPairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 64): DataFrame = {
    // NOT pinned, deliberately (r7 measured): regenerating the deletion
    // neighborhoods for both sides of the self-join is cheap codegen CPU,
    // while checkpointing the postings materializes n*O(L^k) rows — at the
    // stress leg's scale the checkpoint writeback quadrupled task time and
    // saturated the box, and at 1x it bought nothing (1.53s vs 1.55s)
    val p = postings(df, idCol, strCol, maxDist, maxLen)
    val cand = p.select(col("vkey"), col("id").as("i"))
      .join(p.select(col("vkey"), col("id").as("j")), "vkey")
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    cand
      .join(df.select(col(idCol).as("i"), col(strCol).as("__a")), "i")
      .join(df.select(col(idCol).as("j"), col(strCol).as("__b")), "j")
      .select(col("i"), col("j"), levenshtein(col("__a"), col("__b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Word-order-insensitive match key: tokens sorted and re-joined —
    * `"ring small"` and `"small ring"` collapse to the same key.
    */
  def tokenSortKey(s: Column): Column =
    concat_ws(" ", array_sort(split(trim(s), "\\s+")))

  /** Token-sort similarity (the public fuzzywuzzy `token_sort_ratio` shape):
    * normalized edit similarity `1 - lev(sa, sb) / max(|sa|, |sb|)` over the
    * [[tokenSortKey]] forms, so word-order permutations score 1.0 and the
    * residual measures real character difference. Both-empty scores 1.0.
    * Pure Spark/DuckDB builtins on each side — every value the DuckDB oracle
    * recomputes is bit-identical (small-integer rationals through identical
    * IEEE ops), so threshold filters agree even on boundary-exact pairs.
    */
  def tokenSortSimilarity(a: Column, b: Column): Column = {
    val sa = tokenSortKey(a)
    val sb = tokenSortKey(b)
    val m = greatest(length(sa), length(sb))
    when(m === 0, lit(1.0))
      .otherwise(lit(1.0) - levenshtein(sa, sb).cast("double") / m.cast("double"))
  }

  /** Fuzzy dedup: [[fuzzyPairs]] edges → connected components →
    * `(id, cluster)`, cluster = min id of the group — linear output even on
    * duplicate-heavy inputs (same contract as [[Dedup.minhashLsh]]).
    */
  def fuzzyDedup(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 64): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id"))
    val edges = fuzzyPairs(
        df.select(col(idCol).cast("long").as(idCol), col(strCol)),
        idCol, strCol, maxDist, maxLen)
      .select("i", "j")
    Clustering.connectedComponents(ids, edges)
      .withColumnRenamed("component", "cluster")
  }
}
