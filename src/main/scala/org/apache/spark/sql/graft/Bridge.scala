package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion — the
  * supported pattern for third-party Catalyst expressions that want a typed
  * Column API (the alternative, SQL-name registration, is in
  * graft.plans.GraftExtensions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a concrete catalyst Expression.
    * `ExpressionUtils.expression` returns a lazy `ColumnNodeExpression`
    * wrapper, which is neither serializable nor pattern-matchable (a
    * `.desc` column would not surface as catalyst SortOrder) — custom
    * operators embedding expressions in their own plan nodes need the real
    * tree.
    */
  def convertedExpression(
      spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .converter.apply(c.node)

  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A spill file in Spark's task-local scratch space (`spark.local.dir` via
    * the DiskBlockManager — the disks sized for shuffle/spill on a real
    * cluster), falling back to the JVM tmpdir outside an executor context.
    * `prefix` names the file only on the fallback path; executor-side files
    * are DiskBlockManager-named (temp_local_<uuid>) like every other Spark
    * spill. DiskBlockManager is private[spark]; this object lives inside the
    * org.apache.spark tree precisely for bridges like this.
    */
  def localSpillFile(prefix: String): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null && env.blockManager != null) {
      val (_, f) = env.blockManager.diskBlockManager.createTempLocalBlock()
      f
    } else {
      val f = java.io.File.createTempFile(prefix, ".spill")
      f.deleteOnExit()
      f
    }
  }
}
