package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns. The dot
  * product is a native codegen'd Catalyst expression
  * ([[graft.plans.FloatDot]] — a primitive Java loop); the higher-order
  * function form is kept as [[dotHof]] for reference/benchmark comparison.
  */
object Vectors {

  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.floatDot(a, b)

  /** HOF formulation of [[dot]] — CodegenFallback, ~10× slower per pair. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }
}
