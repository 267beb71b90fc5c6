package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (Long, String, String)*) =
    rows.toSeq.toDF("key", "f", "t")
      .select($"key", to_timestamp($"f").as("from_ts"), to_timestamp($"t").as("to_ts"))

  test("mergeIntervals merges overlapping and touching intervals per key") {
    val df = iv(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (1L, "2024-01-01 10:30:00", "2024-01-01 11:30:00"), // overlaps
      (1L, "2024-01-01 11:30:00", "2024-01-01 12:00:00"), // touches
      (1L, "2024-01-01 13:00:00", "2024-01-01 14:00:00"), // separate
      (2L, "2024-01-01 09:00:00", "2024-01-01 09:30:00"))
    val out = Intervals.mergeIntervals(df, Seq("key"), "from_ts", "to_ts")
      .select("key", "from_ts", "to_ts").as[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(out == Seq(
      (1L, sqlTs("2024-01-01 10:00:00"), sqlTs("2024-01-01 12:00:00")),
      (1L, sqlTs("2024-01-01 13:00:00"), sqlTs("2024-01-01 14:00:00")),
      (2L, sqlTs("2024-01-01 09:00:00"), sqlTs("2024-01-01 09:30:00"))))
  }

  test("sweepActiveCount counts concurrent intervals per elementary segment") {
    val df = iv(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (1L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"))
    val out = Intervals.sweepActiveCount(df, Seq("key"), "from_ts", "to_ts")
      .select("segment_start", "segment_end", "active_count")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().sortBy(_._1.getTime).toSeq
    assert(out == Seq(
      (sqlTs("2024-01-01 10:00:00"), sqlTs("2024-01-01 11:00:00"), 1L),
      (sqlTs("2024-01-01 11:00:00"), sqlTs("2024-01-01 12:00:00"), 2L),
      (sqlTs("2024-01-01 12:00:00"), sqlTs("2024-01-01 13:00:00"), 1L)))
  }

  test("allocateToDays clips interval overlap per calendar day") {
    val df = iv((1L, "2024-01-01 23:00:00", "2024-01-02 01:30:00"))
    val out = Intervals.allocateToDays(df, "from_ts", "to_ts")
      .select($"date_id".cast("string"), $"overlap_minutes")
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("2024-01-01", 60.0), ("2024-01-02", 90.0)))
  }

  test("allocateToBuckets clips partial first/last buckets to the interval bounds") {
    // 10:07 → 10:40 over 15-min buckets: [10:07,10:15), [10:15,10:30), [10:30,10:40)
    val df = iv((1L, "2024-01-01 10:07:00", "2024-01-01 10:40:00"))
    val out = Intervals.allocateToBuckets(df, "from_ts", "to_ts", 900L)
      .select($"bucket_start".cast("string"),
        $"clipped_start".cast("string"), $"clipped_end".cast("string"),
        ($"overlap_us" / 60000000L).cast("double"))
      .as[(String, String, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("2024-01-01 10:00:00", "2024-01-01 10:07:00", "2024-01-01 10:15:00", 8.0),
      ("2024-01-01 10:15:00", "2024-01-01 10:15:00", "2024-01-01 10:30:00", 15.0),
      ("2024-01-01 10:30:00", "2024-01-01 10:30:00", "2024-01-01 10:40:00", 10.0)))
  }

  test("dateSpine generates the calendar with correct fields") {
    val out = Intervals.dateSpine(spark, "2024-02-28", "2024-03-01")
    assert(out.count() == 3) // leap year: 02-28, 02-29, 03-01
    val row = out.filter($"date_id" === lit("2024-02-29").cast("date")).collect().head
    assert(row.getAs[Int]("day_of_week") == 5) // Thursday (1=Sunday)
    assert(row.getAs[Int]("quarter") == 1)
  }

  test("timeBucket floors to epoch-aligned buckets") {
    val df = Seq("2024-01-01 10:14:59", "2024-01-01 10:15:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val out = df.select(Intervals.timeBucket($"ts", 900L).cast("string")).as[String].collect().toSeq
    assert(out == Seq("2024-01-01 10:00:00", "2024-01-01 10:15:00"))
  }

  test("silentEntityGaps emits a full-window gap for entities with zero events") {
    val dim = Seq(1L, 2L).toDF("key")
      .withColumn("mstart", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("mend", to_timestamp(lit("2024-01-01 06:00:00")))
    val events = Seq((1L, "2024-01-01 01:00:00")).toDF("key", "s")
      .select($"key", to_timestamp($"s").as("ts"))
    val out = Intervals.silentEntityGaps(dim, events, Seq("key"), "mstart", "mend")
      .select("key", "gap_seconds").as[(Long, Double)].collect().toSeq
    assert(out == Seq((2L, 21600.0)))
  }

  test("heartbeatGaps finds mid, leading and trailing gaps over threshold") {
    val df = Seq(
      (1L, "2024-01-01 02:00:00"), // leading gap 2h from monitor start
      (1L, "2024-01-01 02:30:00"), // mid gap 30min — below threshold
      (1L, "2024-01-01 05:00:00")  // mid gap 2.5h; trailing gap 1h — below
    ).toDF("key", "s")
      .select($"key", to_timestamp($"s").as("ts"))
      .withColumn("mstart", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("mend", to_timestamp(lit("2024-01-01 06:00:00")))
    val out = Intervals.heartbeatGaps(df, Seq("key"), "ts", "mstart", "mend", 3600L)
      .select("from_ts", "to_ts").as[(java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1.getTime).toSeq
    assert(out == Seq(
      (sqlTs("2024-01-01 00:00:00"), sqlTs("2024-01-01 02:00:00")),
      (sqlTs("2024-01-01 02:30:00"), sqlTs("2024-01-01 05:00:00"))))
  }
}
