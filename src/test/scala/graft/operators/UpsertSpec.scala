package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Parity discipline for the key-based incremental merge sink (reference:
  * fact_charge_attempts incremental merge + incremental_date_range buffer):
  * incremental-over-overlapping-batches must equal a full recompute, replay
  * must be a no-op, and partitions outside the batch must not be rewritten.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batch1 = Seq(
    ("a1", ts("2024-01-01 10:00:00"), "Started", 1.0),
    ("a2", ts("2024-01-02 09:00:00"), "Started", 2.0),
    ("a3", ts("2024-01-02 11:00:00"), "Faulted", 0.0)
  ).toDF("attempt_id", "ts", "status", "energy")

  // overlaps batch1: a newer version of a3, an identical replay of a2 (the
  // lookback buffer re-emits rows near the cutoff), and a brand-new a4
  private def batch2 = Seq(
    ("a3", ts("2024-01-02 11:30:00"), "Completed", 5.5),
    ("a2", ts("2024-01-02 09:00:00"), "Started", 2.0),
    ("a4", ts("2024-01-03 08:00:00"), "Started", 3.3)
  ).toDF("attempt_id", "ts", "status", "energy")

  private def readTable(dir: String) =
    spark.read.parquet(dir)
      .select("attempt_id", "ts", "status", "energy", Upsert.PartCol)
      .collect().map(_.toSeq).toSet

  private def partFiles(dir: String, part: String): Set[(String, Long)] = {
    val d = new java.io.File(s"$dir/${Upsert.PartCol}=$part")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
  }

  test("merge over overlapping batches == full recompute; replay idempotent; " +
      "untouched partitions not rewritten") {
    val inc = java.nio.file.Files.createTempDirectory("upsert_inc").toString
    val full = java.nio.file.Files.createTempDirectory("upsert_full").toString

    Upsert.mergeByKey(spark, inc, batch1, Seq("attempt_id"), "ts")
    val day1Before = partFiles(inc, "2024-01-01")
    Upsert.mergeByKey(spark, inc, batch2, Seq("attempt_id"), "ts")

    // full recompute: one materialization of everything, same key rule
    Upsert.mergeByKey(spark, full, batch1.unionAll(batch2), Seq("attempt_id"), "ts")
    assert(readTable(inc) == readTable(full))
    assert(readTable(inc).map(_.head.toString).size == 4) // a1..a4, one row per key

    // the batch touched only 2024-01-02/03 — day 1's files must be untouched
    assert(partFiles(inc, "2024-01-01") == day1Before,
      "dynamic partition overwrite rewrote a partition outside the batch")

    // replay the SAME batch twice more: content must not change
    val afterOnce = readTable(inc)
    Upsert.mergeByKey(spark, inc, batch2, Seq("attempt_id"), "ts")
    assert(readTable(inc) == afterOnce, "first replay changed the table")
    Upsert.mergeByKey(spark, inc, batch2, Seq("attempt_id"), "ts")
    assert(readTable(inc) == afterOnce, "second replay changed the table")
  }

  test("incrementalBatch selects source rows inside max(ts) - buffer window") {
    val dir = java.nio.file.Files.createTempDirectory("upsert_win").toString
    Upsert.mergeByKey(spark, dir, batch1, Seq("attempt_id"), "ts")
    // high-water mark = 2024-01-02 11:00, buffer 60 min → cutoff 10:00
    val source = batch1.unionAll(batch2)
    val selected = Upsert.incrementalBatch(spark, source, "ts", dir, 60)
      .select("attempt_id", "ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(selected == Set(
      ("a3", ts("2024-01-02 11:00:00")),
      ("a3", ts("2024-01-02 11:30:00")),
      ("a4", ts("2024-01-03 08:00:00"))))
    // fresh target → the whole source is the batch
    val fresh = java.nio.file.Files.createTempDirectory("upsert_fresh").toString
    assert(Upsert.incrementalBatch(spark, source, "ts", fresh, 60).count() == source.count())
    // forward cap (the macro's incremental_window): a far-behind rebuild
    // advances in bounded chunks — 12 h past the 11:00 cutoff excludes the
    // next-day row but keeps the near-cutoff ones
    val capped = Upsert.incrementalBatch(spark, source, "ts", dir, 60, maxWindowHours = Some(12))
      .select("attempt_id", "ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(capped == Set(
      ("a3", ts("2024-01-02 11:00:00")),
      ("a3", ts("2024-01-02 11:30:00"))))
  }

  test("a null merge timestamp fails loudly instead of silently replacing the null partition") {
    val dir = java.nio.file.Files.createTempDirectory("upsert_null").toString
    val bad = Seq(("k1", Option(ts("2024-01-01 10:00:00")), "ok", 1.0),
        ("k2", Option.empty[Timestamp], "bad", 2.0))
      .toDF("attempt_id", "ts", "status", "energy")
    val ex = intercept[Exception] {
      Upsert.mergeByKey(spark, dir, bad, Seq("attempt_id"), "ts")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null ts in batch")), ex.toString)
  }

  test("duplicate keys inside one batch resolve deterministically (ts, then tie-break)") {
    val dir = java.nio.file.Files.createTempDirectory("upsert_tie").toString
    val dup = Seq(
      ("k", ts("2024-01-01 10:00:00"), "v1", 1.0),
      ("k", ts("2024-01-01 10:00:00"), "v2", 2.0) // same ts: tie-break on status
    ).toDF("attempt_id", "ts", "status", "energy")
    Upsert.mergeByKey(spark, dir, dup, Seq("attempt_id"), "ts", tieBreakCols = Seq("status"))
    val rows = readTable(dir)
    assert(rows.size == 1 && rows.head(2) == "v2") // max status wins
  }
}
