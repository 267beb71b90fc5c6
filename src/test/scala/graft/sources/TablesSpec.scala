package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("loadCsv reads with explicit schema, no inference pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("chargers.csv")
    java.nio.file.Files.writeString(f,
      "charge_point_id,location_id,commissioned_ts\ncp1,loc1,2024-01-01 10:00:00\ncp2,loc1,\n")
    val schema = StructType(Seq(
      StructField("charge_point_id", StringType),
      StructField("location_id", StringType),
      StructField("commissioned_ts", TimestampType)))
    val df = Tables.loadCsv(spark, f.toString, schema)
    assert(df.schema == schema)
    val rows = df.select("charge_point_id").as[String].collect().sorted.toSeq
    assert(rows == Seq("cp1", "cp2"))
    assert(df.filter($"commissioned_ts".isNull).count() == 1)
  }

  test("loadJson reads JSON lines with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    val f = dir.resolve("logs.json")
    java.nio.file.Files.writeString(f,
      """{"id":"cp1","action":"Heartbeat","ts":1700000000}
        |{"id":"cp2","action":"StatusNotification","ts":1700000001}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("action", StringType),
      StructField("ts", LongType)))
    val df = Tables.loadJson(spark, f.toString, schema)
    assert(df.count() == 2)
    assert(df.filter($"action" === "Heartbeat").select("id").as[String].collect().toSeq == Seq("cp1"))
  }

  test("events loader converts nanosecond parquet timestamps to TimestampType") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 1000)
  }
}
