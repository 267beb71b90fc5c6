package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass scanner for the reference's two-level meter-value frame
  * shape (models/intermediate/int_meter_values.sql:92-171):
  * `[{"grp": g, "sv": [{"m": name, "v": num}, ...]}, ...]` — emitted
  * FLATTENED as `array<struct<grp,m,v>>`, so one `explode` replaces
  * parse → nested cast → two explodes.
  *
  * Both generic routes (`from_json` and `parse_json`→VARIANT cast) build a
  * full JSON tree per row in an interpreted projection; this kernel scans
  * the bytes once, allocates only the output rows, and stays inside
  * whole-stage codegen (same discipline as [[WordShingles]]). `v` parses
  * with `Double.parseDouble` — the identical correctly-rounded decimal →
  * binary conversion every engine applies to a JSON number, so results
  * remain hash-exact vs the DuckDB oracle.
  *
  * Semantics mirror `from_json` on this shape: malformed input → NULL
  * result (row drops out of the downstream explode); a JSON `null` value →
  * null `v`. Keys must appear as `grp` then `sv` (the shape the staging
  * layer emits); unknown trailing keys are rejected rather than skipped —
  * this is an operator kernel for a fixed frame layout, not a general JSON
  * parser.
  */
case class MeterFrames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("grp", StringType, nullable = true),
      StructField("m", StringType, nullable = true),
      StructField("v", DoubleType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"meter_frames requires a string input, got ${child.dataType.simpleString}")

  override def prettyName: String = "meter_frames"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    JsonKernels.meterFrames(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} = graft.plans.JsonKernels.meterFrames($in);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonKernels {

  /** Returns the flattened frame rows, or null on any shape violation. */
  def meterFrames(input: UTF8String): ArrayData = {
    val s = input.toString
    val n = s.length
    var i = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    def ws(): Unit = while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t'
      || s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    def eat(c: Char): Boolean = { ws(); if (i < n && s.charAt(i) == c) { i += 1; true } else false }
    // JSON string with the two escapes the staging layer can emit; returns
    // null on malformed input
    def str(): UTF8String = {
      ws()
      if (i >= n || s.charAt(i) != '"') return null
      i += 1
      val sb = new java.lang.StringBuilder()
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      if (i >= n) return null
      i += 1
      UTF8String.fromString(sb.toString)
    }
    // JSON number or null literal; NaN sentinel (boxed) on malformed input
    def num(): java.lang.Double = {
      ws()
      if (i + 3 < n && s.charAt(i) == 'n' && s.startsWith("null", i)) {
        i += 4; return null
      }
      val start = i
      while (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+' || s.charAt(i) == '.'
        || s.charAt(i) == 'e' || s.charAt(i) == 'E'
        || (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
      if (i == start) return java.lang.Double.valueOf(Double.NaN)
      try java.lang.Double.valueOf(s.substring(start, i))
      catch { case _: NumberFormatException => java.lang.Double.valueOf(Double.NaN) }
    }
    def key(name: String): Boolean = {
      val k = str()
      k != null && k.toString == name && eat(':')
    }

    if (!eat('[')) return null
    ws()
    if (i < n && s.charAt(i) == ']') { i += 1; return new GenericArrayData(out.toArray) }
    var more = true
    while (more) {
      if (!eat('{') || !key("grp")) return null
      val grp = str()
      if (grp == null || !eat(',') || !key("sv") || !eat('[')) return null
      ws()
      if (i < n && s.charAt(i) == ']') i += 1
      else {
        var moreSv = true
        while (moreSv) {
          if (!eat('{') || !key("m")) return null
          val m = str()
          if (m == null || !eat(',') || !key("v")) return null
          val v = num()
          if (v != null && v.isNaN) return null
          if (!eat('}')) return null
          out += new GenericInternalRow(Array[Any](grp, m,
            if (v == null) null else v.doubleValue()))
          if (eat(',')) () else { moreSv = false; if (!eat(']')) return null }
        }
      }
      if (!eat('}')) return null
      if (eat(',')) () else { more = false; if (!eat(']')) return null }
    }
    ws()
    if (i != n) return null
    new GenericArrayData(out.toArray)
  }
}

object JsonExpressions {
  /** Column API for [[MeterFrames]]. */
  def meterFrames(payload: Column): Column =
    Bridge.column(MeterFrames(Bridge.expression(payload)))
}
