package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

class JsonExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val frameType = DataType.fromDDL(
    "array<struct<grp:string,sv:array<struct<m:string,v:double>>>>")

  test("meter_frames equals the from_json route on generated frame payloads") {
    // same payload shape q_nested_unnest synthesizes, with varied values
    val rows = spark.range(500).select(
      col("id"),
      concat(
        lit("[{\"grp\":\"a\",\"sv\":[{\"m\":\"value\",\"v\":"),
        (col("id") * 1.7 - 3.21).cast("string"),
        lit("},{\"m\":\"key\",\"v\":"), col("id").cast("string"),
        lit("}]},{\"grp\":\"b\",\"sv\":[{\"m\":\"key2\",\"v\":"),
        col("id").cast("string"), lit("}]}]")).as("payload"))
    val kernel = rows.select(col("id"),
        explode(JsonExpressions.meterFrames(col("payload"))).as("r"))
      .select(col("id"), col("r.grp"), col("r.m"), col("r.v"))
    val generic = rows.select(col("id"),
        explode(from_json(col("payload"), frameType)).as("mv"))
      .select(col("id"), col("mv.grp").as("grp"), explode(col("mv.sv")).as("s"))
      .select(col("id"), col("grp"), col("s.m").as("m"), col("s.v").as("v"))
    assert(kernel.exceptAll(generic).count() == 0)
    assert(generic.exceptAll(kernel).count() == 0)
  }

  test("meter_frames edge cases: empty array, empty sv, null v, escapes, malformed") {
    def frames(payload: String): Option[Seq[(String, String, Option[Double])]] = {
      val out = Seq(payload).toDF("p")
        .select(JsonExpressions.meterFrames(col("p")).as("r"))
        .collect().head
      if (out.isNullAt(0)) None
      else Some(out.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    assert(frames("[]") == Some(Seq()))
    assert(frames("""[{"grp":"a","sv":[]}]""") == Some(Seq()))
    assert(frames("""[{"grp":"a","sv":[{"m":"x","v":null}]}]""")
      == Some(Seq(("a", "x", None))))
    assert(frames("""[{"grp":"q\"t","sv":[{"m":"x","v":-1.5e2}]}]""")
      == Some(Seq(("q\"t", "x", Some(-150.0)))))
    assert(frames("""{"grp":"a"}""") == None, "non-array top level")
    assert(frames("""[{"grp":"a","sv":[{"m":"x","v":oops}]}]""") == None)
    assert(frames("""[{"sv":[],"grp":"a"}]""") == None, "fixed key order enforced")
  }
}
