package graft.operators

/** Shared serving-regime tuning for the persisted indexes. A search at
  * serving scale spends its wall on Spark scheduler round-trips, not data —
  * so when a search's estimated pruned scan (from the row count the index
  * meta records at write time) fits under this budget, the scoring chain
  * runs as ONE single-partition stage (`coalesce(1)` lets every aggregate
  * elide its exchange). Above the budget — or on a pre-r8 index without a
  * recorded row count — the parallel plan runs unchanged. Results are
  * identical either way: the bounded top-k and ordered-sum aggregates are
  * partition-order-invariant (spec-pinned).
  */
object Serving {
  val SingleStageRowsKey = "spark.graft.serving.singleStageRows"

  /** ~131k scanned rows: a fraction of a second of single-task work for the
    * widest row these indexes store, far above any interactive search's
    * pruned scan, far below anything that wants the parallel plan.
    */
  val DefaultSingleStageRows: Long = 1L << 17

  def singleStageRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(SingleStageRowsKey).map(_.toLong)
      .getOrElse(DefaultSingleStageRows)

  /** The serving regime's second precondition: the index frames are PINNED
    * (a retrieval service persists them once at open). A cold one-shot
    * batch query must keep the parallel plan — the single-partition chain
    * serializes the corpus scan onto one thread, which is right for a hot
    * cache probed repeatedly and wrong for a fresh parquet read (measured:
    * the minhash one-shot leg went 0.38→2.4 s when the fast path fired
    * cold). `Dataset.storageLevel` is the public cachedness probe.
    */
  def pinned(dfs: org.apache.spark.sql.DataFrame*): Boolean =
    dfs.forall(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
}
