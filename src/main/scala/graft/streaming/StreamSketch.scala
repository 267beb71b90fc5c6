package graft.streaming

import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming distinct-count sketching — live cardinality dashboards
  * ("unique users per event type, now") over an unbounded stream.
  *
  * The register formulation is what makes this possible: HLL registers are
  * a per-(group, bucket) MAX, and max is an associative, idempotent
  * streaming aggregate — so the state store holds at most groups×256 rows
  * FOREVER, while a streaming `count(distinct)` would need O(corpus) state
  * and is not even supported. No watermark is needed: registers only ever
  * tighten, they never need eviction.
  *
  * Emit registers in update mode and estimate downstream (foreachBatch or
  * any reader of the register sink) with [[Sketch.estimate]] — the same
  * exact-arithmetic estimator as the batch path, so a streaming register
  * table and a batch register table over the same data are IDENTICAL rows
  * (spec-proven), and merge freely via [[Sketch.mergeRegisters]].
  */
object StreamSketch {

  /** Streaming register maintenance for `value` per `groupCols`. The
    * result is an update-mode streaming aggregate: one row per
    * (group..., bucket) with the running max rank.
    */
  def registers(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      seed: Long): DataFrame =
    Sketch.registers(stream, groupCols, col(valueCol), seed)
}
