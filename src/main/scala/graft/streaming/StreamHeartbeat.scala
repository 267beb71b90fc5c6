package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heartbeat-gap (offline outage) detection — the streaming
  * counterpart of `graft.operators.Intervals.heartbeatGaps` and of the
  * reference's incremental int_offline_outages
  * (models/intermediate/outages/int_offline_outages.sql: each run re-reads
  * a buffer and merges boundary-touching outages). Here per-entity
  * last-heartbeat state lives in the state store:
  *
  *  - a heartbeat arriving more than `thresholdSeconds` after the previous
  *    one emits a CLOSED gap ending at the new heartbeat immediately;
  *  - an entity that stops emitting entirely is caught by an event-time
  *    timeout: when the watermark passes last_ts + threshold, an ONGOING
  *    gap up to the watermark is emitted (`closed = false`), and extended
  *    by further increments on later timeouts — a dead charger surfaces
  *    without waiting for its next message, the case a batch lag() can
  *    never see.
  *
  * Emitted rows are NON-OVERLAPPING INCREMENTS of outage time: an ongoing
  * outage appears as a chain of touching [from, to] rows (the closed row
  * that ends it starts where the last increment stopped). That makes the
  * output both delta-summable (daily downtime = sum of allocated increment
  * minutes — see [[StreamUptime]]) and reconstructable
  * (`Intervals.mergeIntervals` re-merges touching increments into whole
  * outages, exactly how the reference's incremental merge re-reads its
  * boundary buffer).
  *
  * State is one (tsMillis, emittedUntil) pair per entity — O(entities),
  * independent of event volume; scales with the RocksDB state store.
  */
object StreamHeartbeat {

  case class Heartbeat(key: Long, ts: java.sql.Timestamp)
  case class Gap(
      key: Long, from_ts: java.sql.Timestamp, to_ts: java.sql.Timestamp, closed: Boolean)
  case class LastSeen(tsMillis: Long, emittedOpenUntil: Long)

  /** @param watermark max event lateness (e.g. "1 minute") — drives the
    *                   event-time timeouts that surface silent entities
    */
  def gaps(
      ds: Dataset[Heartbeat],
      thresholdSeconds: Long,
      watermark: String = "0 seconds"): Dataset[Gap] = {
    implicit val gapEnc = Encoders.product[Gap]
    implicit val stateEnc = Encoders.product[LastSeen]
    implicit val keyEnc = Encoders.scalaLong
    val thresholdMs = thresholdSeconds * 1000L
    ds.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: Long, events: Iterator[Heartbeat], state: GroupState[LastSeen]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[Gap]
          if (!events.hasNext) {
            // timeout fired: watermark passed last_ts + threshold with no
            // new heartbeat → the entity is silent RIGHT NOW; emit the
            // not-yet-reported increment of the ongoing outage
            state.getOption.foreach { s =>
              val wm = state.getCurrentWatermarkMs()
              val from = math.max(s.tsMillis, s.emittedOpenUntil)
              if (wm > s.tsMillis + thresholdMs && wm > from) {
                out += Gap(key, new java.sql.Timestamp(from),
                  new java.sql.Timestamp(wm), closed = false)
                state.update(LastSeen(s.tsMillis, wm))
                state.setTimeoutTimestamp(wm + thresholdMs)
              }
            }
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var last = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              last match {
                case Some(s) if t > s.tsMillis =>
                  // start the closed increment where open increments stopped
                  val from = math.max(s.tsMillis, s.emittedOpenUntil)
                  if (t - s.tsMillis > thresholdMs && t > from)
                    out += Gap(key, new java.sql.Timestamp(from),
                      new java.sql.Timestamp(t), closed = true)
                  last = Some(LastSeen(t, 0L))
                case None => last = Some(LastSeen(t, 0L))
                case _ => // late/duplicate heartbeat — state already newer
              }
            }
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.tsMillis + thresholdMs)
            }
          }
          out.iterator
        })
  }
}
