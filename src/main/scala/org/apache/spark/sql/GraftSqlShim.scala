package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for `private[sql]` Spark internals that extension libraries
  * conventionally reach through a same-package shim:
  *
  *  - registering custom Catalyst expressions as Columns
  *    (`classic.ExpressionUtils` is `private[sql]` in Spark 4.x)
  *  - cloning a session so an iterative driver loop can pin SQL confs
  *    (AQE, join-strategy preference) without mutating — and racing on —
  *    the user's shared session conf
  *  - truncating a materialized DataFrame's logical plan to a flat
  *    `LogicalRDD` without the extra materialization job that
  *    `localCheckpoint(eager = true)` costs.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A child session sharing the SparkContext, cache and catalog of
    * `parent` but with an isolated SQL conf overridden by `confs` —
    * runtime conf changes here are invisible to `parent`.
    */
  def sessionWithConfs(parent: SparkSession, confs: (String, String)*): SparkSession = {
    val s = parent.asInstanceOf[classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Re-bind a DataFrame's plan to `session` so physical planning and
    * execution run under that session's SQL conf.
    */
  def bind(session: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** A DataFrame with the same rows as `df` but a flat `LogicalRDD` plan
    * over `df`'s executed RDD. When `df` is persisted and materialized the
    * RDD scans its cache, so this truncates the *logical* lineage (whose
    * analysis cost would otherwise double per superstep — a step references
    * its input twice) at zero execution cost. The RDD-level DAG still grows
    * and is truncated separately with a periodic `localCheckpoint`.
    *
    * Rows are defensively copied (`InternalRow`s coming out of columnar
    * cache scans are reused buffers; `LogicalRDD`'s contract expects owned
    * rows — same as `Dataset.checkpoint`'s internal implementation).
    */
  def truncatedView(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.DataFrame]
    // LogicalRDD.fromDataset carries the physical plan's outputPartitioning
    // and ordering into the wrapper (same path Dataset.checkpoint uses), so
    // downstream co-partitioned joins stay exchange-free.
    val logical = execution.LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd.map(_.copy()), cdf, isStreaming = false)
    classic.Dataset.ofRows(cdf.sparkSession, logical)
  }
}
