package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register-once gate for the engine's native SQL functions.
  *
  * Every `graft_*` helper registers through here; the exists-check makes
  * re-registration a no-op instead of a replace, so per-query calls
  * (`VectorExpressions.cosine` et al. register defensively on each use)
  * don't spam the session's SimpleFunctionRegistry replace-warning into
  * stdout — the same noise band the round-3 bench parser miss came from.
  */
private[functions] object Registry {
  def ensure(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
