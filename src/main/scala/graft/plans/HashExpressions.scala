package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 64-bit string hash family: FNV-1a fold over the UTF-8
  * bytes, then a splitmix64 finalizer seeded per family member.
  *
  *   h  = fold_{b in bytes} (h ^ b) * 0x100000001b3,  h0 = 0xcbf29ce484222325
  *   z  = h + seed * 0x9E3779B97F4A7C15
  *   z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9
  *   z ^= z >>> 27; z *= 0x94D049BB133111EB
  *   z ^= z >>> 31
  *
  * Why not xxhash64: the gate's DuckDB oracle cannot replay Spark's
  * xxhash64, so every xxhash64-based signature was stuck with a rows-only
  * check. This family is plain wraparound integer arithmetic that DuckDB
  * reproduces digit-for-digit in SQL (hugeint limb-split multiplication mod
  * 2^64 — see SparkEntry's FnvSql helpers), turning the MinHash/SimHash
  * fast paths into hash-exact oracle queries. The splitmix finalizer gives
  * the seeds avalanche independence (plain seeded-basis FNV would correlate
  * adjacent seeds on short strings); one string fold serves all k family
  * members. Codegen'd via a static kernel call; throughput on ~20-byte
  * shingles is on par with xxhash64.
  */
case class FnvMix(child: Expression, seed: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv_mix requires a string input, got ${child.dataType.simpleString}")

  override def prettyName: String = "fnv_mix"

  override def nullSafeEval(input: Any): Any =
    HashKernels.fnvMix(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.HashKernels.fnvMix($in, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashKernels {
  final val FnvBasis = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L
  final val Golden = 0x9E3779B97F4A7C15L
  final val Mix1 = 0xBF58476D1CE4E5B9L
  final val Mix2 = 0x94D049BB133111EBL

  def fnvMix(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = FnvBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    var z = h + seed * Golden
    z = (z ^ (z >>> 30)) * Mix1
    z = (z ^ (z >>> 27)) * Mix2
    z ^ (z >>> 31)
  }
}

/** Number of leading zero bits of a 64-bit value (0..64). Codegen'd to the
  * JDK intrinsic; the DuckDB oracle replays it with an exact integer CASE
  * chain over power-of-two thresholds (no floating log2, whose floor can be
  * off by one ulp near powers of two).
  */
case class Clz64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clz64 requires a bigint input, got ${child.dataType.simpleString}")

  override def prettyName: String = "clz64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = java.lang.Long.numberOfLeadingZeros($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Column API for [[FnvMix]]. */
  def fnvMix(text: Column, seed: Long): Column =
    Bridge.column(FnvMix(Bridge.expression(text), seed))

  /** Column API for [[Clz64]]. */
  def clz64(bits: Column): Column =
    Bridge.column(Clz64(Bridge.expression(bits)))
}
