package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Entry points for the Catalyst-native semantic join: a Dataset-level
  * constructor, a `graft_knn_join` SQL table function, and the session
  * wiring that installs the strategy + optimizer rule at runtime (the
  * config-time path is `spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftPlans {

  /** Build the planned semantic top-k join over two DataFrames. Same output
    * contract as [[graft.operators.SemanticJoin.knnJoinVec]]; the plan is a
    * single custom node until [[GraftStrategy]] lowers it, so `explain` shows
    * `SemanticTopKJoinExec` with a `BroadcastExchange` on the right child.
    * Children are pre-projected to (id, vec) so scans stay 2-column.
    */
  def knnJoin(
      left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    def proj(df: DataFrame, cols: Seq[String]): LogicalPlan =
      Project(cols.map(UnresolvedAttribute(_)), ColumnBridge.analyzedPlan(df))
    ColumnBridge.ofRows(spark, SemanticTopKJoin(
      proj(left, Seq(leftId, leftVec)), proj(right, Seq(rightId, rightVec)),
      leftId, leftVec, rightId, rightVec, k, excludeSelf))
  }

  /** `graft_knn_join('l_tbl','r_tbl','lid','lvec','rid','rvec', k[, excludeSelf])`
    * table-function builder: table names resolve through the session catalog
    * (temp views included), children are pre-projected to the two used
    * columns, and the node itself carries the by-name bindings.
    */
  private def knnJoinBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7 || args.length == 8,
      "graft_knn_join(leftTable, rightTable, leftId, leftVec, rightId, rightVec, k[, excludeSelf])")
    def str(e: Expression, what: String): String = e match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
    }
    def int(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    def bool(e: Expression, what: String): Boolean = e match {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
    }
    val Seq(lt, rt) = args.take(2).zip(Seq("leftTable", "rightTable")).map((str _).tupled)
    val Seq(lid, lvec, rid, rvec) =
      args.slice(2, 6).zip(Seq("leftId", "leftVec", "rightId", "rightVec")).map((str _).tupled)
    val k = int(args(6), "k")
    val excludeSelf = args.length > 7 && bool(args(7), "excludeSelf")
    def rel(table: String, cols: Seq[String]): LogicalPlan =
      Project(cols.map(UnresolvedAttribute(_)),
        UnresolvedRelation(table.split('.').toIndexedSeq))
    SemanticTopKJoin(rel(lt, Seq(lid, lvec)), rel(rt, Seq(rid, rvec)),
      lid, lvec, rid, rvec, k, excludeSelf)
  }

  /** (name, info, builder) for every exposed table function. */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq((FunctionIdentifier("graft_knn_join"),
      new ExpressionInfo("graft", "graft_knn_join"),
      knnJoinBuilder _))

  /** Install strategy, pushdown rule, and table functions on a live session.
    * Idempotent — safe to call per query.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ GraftStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughSemanticTopKJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughSemanticTopKJoin
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }
  }
}
