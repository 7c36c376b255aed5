package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x column-node API).
  * Lives under the org.apache.spark.sql package solely to satisfy the
  * `private[sql]` access check; exposes only public types.
  */
object SparkInternals {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (analyzed) LogicalPlan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]`. Lets an optimizer rule build its replacement plan
    * with the DataFrame API over the SAME child plans (attribute
    * identity is preserved: the wrapped plan's output attributes ARE the
    * originals). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's TABLE-function registry (`SELECT * FROM fn(...)`) —
    * `SessionState` is `private[sql]`, so the accessor lives here. */
  def tableFunctionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry

  /** The session's SQLConf (`sessionState` is `private[sql]`) — needed
    * to run Spark's own parquet→Spark schema conversion driver-side with
    * the session's conversion flags (binaryAsString, int96AsTimestamp,
    * inferTimestampNTZ, nanosAsLong). */
  def sqlConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.internal.SQLConf =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf

  /** Ensure the driver's StateStoreCoordinator RPC endpoint exists. A
    * stateful STREAMING query registers it on start, but BATCH execution of
    * a stateful operator (transformWithState on a batch Dataset) skips that
    * path and executors then fail looking the endpoint up. `forDriver` is
    * idempotent — it registers the endpoint or returns the existing one. */
  def ensureStateStoreCoordinator(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
      .forDriver(org.apache.spark.SparkEnv.get,
        org.apache.spark.sql.internal.SQLConf.get)
}
