package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Column ↔ Expression bridge.
  *
  * Spark 4 routes the public `Column` API through `ColumnNode` and marks
  * the classic converters `private[sql]`, so a library defining a custom
  * Catalyst `Expression` (graft.functions.VectorDot) needs one file inside
  * the `org.apache.spark.sql` namespace to lift it into a `Column` — the
  * established extension pattern in the Spark ecosystem (Delta's
  * `org.apache.spark.sql.delta`, Sedona, spark-nlp all ship such a shim).
  * EVERYTHING else in this repo stays under `graft.*`; keep this file to
  * the minimal accessors below.
  */
object Bridge {

  /** Lift a Catalyst expression into the public Column API. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into the SESSION registry (not the
    * global builtin registry), for the SQL surface on sessions that were
    * not built with `withExtensions`.
    */
  def registerFunction(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Wrap a (resolved) logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]` in Spark 4; needed to expose custom logical operators
    * (graft.plans.TopKPerKey) through the public DataFrame API.
    */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Split a possibly-quoted multipart identifier (`` `my.db`.tbl ``) with
    * the session's SQL parser — `sessionState` is `private[sql]`.
    */
  def parseMultipartIdentifier(spark: SparkSession, name: String): Seq[String] =
    spark.sessionState.sqlParser.parseMultipartIdentifier(name)

  /** Idempotently add a planner strategy to an EXISTING session (the
    * `experimental.extraStrategies` route; sessions built with
    * `withExtensions` use `injectPlannerStrategy` instead).
    */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[ClassicSparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
