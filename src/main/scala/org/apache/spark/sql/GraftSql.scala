package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ↔ Expression converters, so graft's
  * native Catalyst expressions can surface as Columns (the supported
  * extension seam for libraries adding codegen'd expressions).
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (the seam custom operators use
    * to surface their plan nodes).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A Scala UDF as a catalyst ScalaUDF expression — what a function-
    * registry builder must return (a Column-API wrapper would embed an
    * Unevaluable column node in SQL-originated plans).
    */
  def scalaUdfExpression(
      f: org.apache.spark.sql.expressions.UserDefinedFunction,
      args: Seq[Expression]): Expression =
    classic.UserDefinedFunctionUtils.toScalaUDF(
      f.asInstanceOf[org.apache.spark.sql.expressions.SparkUserDefinedFunction], args)

  /** The resolved checkpoint root of a running streaming query — the
    * scope key a lifecycle listener needs to release per-sink pinned
    * resources at termination (the terminated event itself carries only
    * ids). Private[sql] surface: the classic StreamingQueryWrapper →
    * StreamExecution path; non-classic query objects yield None.
    */
  def checkpointOf(q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: execution.streaming.runtime.StreamingQueryWrapper =>
        Some(w.streamingQuery.resolvedCheckpointRoot)
      case _ => None
    }

  /** The same frame minus a TOP-LEVEL global Sort, if one is present.
    *
    * Batch entry points end with a presentation `orderBy`; reused
    * inside a foreachBatch sink, that global sort makes every
    * micro-batch pay a range-partitioning sample job plus a full sort
    * for an ordering an append-mode file sink does not preserve across
    * batches anyway. Stripping the one analyzed-plan Sort node keeps
    * sink results row-identical to the batch form (same lineage, same
    * values) without maintaining parallel unordered variants that
    * could drift.
    */
  def unordered(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global =>
        ofRows(df.sparkSession, s.child)
      case _ => df
    }

  /** Unpersist the RDD behind an eager `localCheckpoint()` result.
    *
    * `Dataset.unpersist` is a no-op on checkpointed frames (the RDD is
    * pinned by the checkpoint, not the cache manager), so iterative
    * loops that checkpoint per round — the GraphX discipline — leak one
    * persisted per-node table per iteration for the session's lifetime:
    * real executor storage at frontier scale. Matches ONLY a frame
    * whose analyzed plan IS the checkpoint's `LogicalRDD` leaf (the
    * exact shape `localCheckpoint` returns) — a derived frame that
    * merely CONTAINS checkpoint leaves (e.g. anything joining the
    * loop's edge table) is left alone, so a release can never reach
    * through a projection and kill a sibling's live state.
    *
    * Only for checkpoints that are DEAD — fully consumed by a later
    * eager materialization (the next round's checkpoint, a Freeze
    * pin). The released RDD has no lineage to recompute from; that is
    * the same recompute-on-loss trade `localCheckpoint` itself makes.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Register a builder-based SQL function into a RUNNING session's
    * function registry (the extensions path only applies at session
    * construction).
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
