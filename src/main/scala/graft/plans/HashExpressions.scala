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

  /** [[fnvMix]] over a byte RANGE — bit-identical to hashing the
    * equivalent substring, without materializing it. */
  def fnvMixRange(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = FnvBasis
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    var z = h + seed * Golden
    z = (z ^ (z >>> 30)) * Mix1
    z = (z ^ (z >>> 27)) * Mix2
    z ^ (z >>> 31)
  }

  /** One-pass multiclass hashed-char-trigram weight sums — the
    * [[graft.operators.LangClassifier]] hot kernel: Unicode-lowercase the
    * string (the `lower()` semantics), walk its code points, and for each
    * trigram window fold [[fnvMixRange]] over the window's UTF-8 bytes
    * (bit-identical to `fnv_mix(substr(lower(s), i, 3))`), bucket by
    * `floorMod(z, B)` (= pmod), and accumulate every class's int8 weight.
    * Returns a C-length sum array; one string scan, one int-array
    * allocation, no per-trigram string materialization. Called from
    * generated code — must stay a plain static-shaped method.
    */
  def trigramClassSums(
      s: UTF8String,
      weights: Array[Array[Long]],
      seed: Long,
      buckets: Int): Array[Long] = {
    val c = weights.length
    val out = new Array[Long](c)
    val lower = s.toLowerCase
    val n = lower.numChars()
    if (n < 3) return out
    val bytes = lower.getBytes
    // code-point start offsets (starts(n) = total bytes, the end sentinel)
    val starts = new Array[Int](n + 1)
    var pos = 0
    var ci = 0
    while (ci < n) {
      starts(ci) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      ci += 1
    }
    starts(n) = bytes.length
    var i = 0
    while (i <= n - 3) {
      val z = fnvMixRange(bytes, starts(i), starts(i + 3), seed)
      val bk = java.lang.Math.floorMod(z, buckets.toLong).toInt
      var k = 0
      while (k < c) { out(k) += weights(k)(bk); k += 1 }
      i += 1
    }
    out
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

/** Native multiclass hashed-trigram scorer: per-class exact integer
  * weight sums over the char trigrams of the LOWERCASED input — the
  * whole-stage-codegen replacement for `transform(trigrams, fnv_mix)` +
  * C interpreted `aggregate` folds, which dominated q_lang_classify's
  * sf10 decade (the [[graft.plans.NearestCentroid]] precedent: HOFs are
  * CodegenFallback; a native kernel turns the scan into one string pass).
  * Semantically IDENTICAL to the HOF formulation (same Unicode lowercase,
  * same per-trigram byte fold, same pmod bucketing), so the DuckDB replay
  * is unchanged. Returns `array<bigint>` of length C.
  */
case class TrigramClassSums(
    child: Expression,
    weights: Array[Array[Long]],
    seed: Long) extends UnaryExpression {

  require(weights.nonEmpty && weights.forall(_.length == weights.head.length),
    "need >= 1 weight vector, all of one length")
  require((weights.head.length & (weights.head.length - 1)) == 0,
    "bucket count must be a power of two (engine-portable pmod)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_class_sums requires a string input, got ${child.dataType.simpleString}")

  override def prettyName: String = "trigram_class_sums"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashKernels.trigramClassSums(
        input.asInstanceOf[UTF8String], weights, seed, weights.head.length))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("tcsWeights", weights, "long[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.HashKernels.trigramClassSums(
         |    $in, $wRef, ${seed}L, ${weights.head.length}));
       """.stripMargin)
  }

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

  /** Column API for [[TrigramClassSums]]. */
  def trigramClassSums(text: Column, weights: Seq[Array[Int]], seed: Long): Column =
    Bridge.column(TrigramClassSums(Bridge.expression(text),
      weights.map(_.map(_.toLong)).toArray, seed))
}
