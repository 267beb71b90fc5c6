package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingestion dedup — the exact-dedup stage of a training-data
  * pipeline applied at ingest time: re-delivered documents (at-least-once
  * sources re-send on retry) are dropped before they reach the corpus.
  *
  * Built on `dropDuplicatesWithinWatermark`: the state store keys on the
  * deterministic content fingerprint, and the event-time watermark BOUNDS
  * the state — a key is held only as long as a duplicate can still legally
  * arrive, so state is O(keys-per-watermark-window), not O(corpus). (Plain
  * `dropDuplicates` on a stream never evicts and would OOM a 100 TB
  * ingest.) The fingerprint is [[graft.functions.Text.fingerprint]]'s
  * normalized-content hash, so re-sends AND trivially re-formatted copies
  * collapse; pass `byCols` to dedup on an explicit id instead.
  */
object StreamDedup {

  /** Drop re-deliveries of the same fingerprint arriving within
    * `watermarkDelay` of the stream's event-time high-water mark.
    */
  def exactDedup(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("_fp", graft.functions.Text.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Key-based variant: dedup on explicit columns (e.g. a document id). */
  def exactDedupByCols(
      stream: DataFrame,
      byCols: Seq[String],
      tsCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(byCols)
}
