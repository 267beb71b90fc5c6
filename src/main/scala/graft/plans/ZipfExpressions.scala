package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Zipf-corpus word generator — the whole-stage-codegen
  * replacement for `graft.sources.ZipfCorpus`'s per-word md5 draws
  * through `transform` lambdas (HOFs are CodegenFallback: every word of
  * every doc paid an interpreted cast→concat→md5→substring→conv chain,
  * the dominant residual on the four zipf pair-mining gates after the
  * r17 materializeBase fix).
  *
  * Output is BIT-IDENTICAL to the HOF formulation (ZipfWordsSpec pins
  * it element-for-element, and the DuckDB oracle replay is untouched):
  * for doc_id d,
  *
  *   n      = 10 + ((u20(md5(d + ":len")) * 91) >> 20)          (10..100)
  *   u_i    = u20(md5(d + ":" + i)),  i = 1..n
  *   word_i = "w" + (((u_i^3 >> 40) * 20000) >> 20)
  *
  * where u20(x) is the first 5 hex chars of the md5 digest read as an
  * integer — i.e. the top 20 bits of the digest
  * (d0 << 12 | d1 << 4 | d2 >>> 4), exactly what
  * `conv(substring(md5(s), 1, 5), 16, 10)` computes. One MessageDigest
  * and one byte buffer serve all n+1 draws of a row.
  */
case class ZipfWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zipf_words requires a bigint input, got ${child.dataType.simpleString}")

  override def prettyName: String = "zipf_words"

  override def nullSafeEval(input: Any): Any =
    ZipfKernel.words(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.ZipfKernel.words($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ZipfKernel {
  private val VocabSize = 20000L

  /** md5 top-20-bits of (idBytes ++ suffixBytes) — digit-for-digit the
    * value of `conv(substring(md5(concat(id, suffix)), 1, 5), 16, 10)`:
    * the first 5 hex chars of the digest are its top 20 bits. */
  private def u20(
      md: java.security.MessageDigest,
      idBytes: Array[Byte],
      suffix: Array[Byte]): Long = {
    md.reset()
    md.update(idBytes)
    md.update(suffix)
    val d = md.digest()
    ((d(0) & 0xffL) << 12) | ((d(1) & 0xffL) << 4) | ((d(2) & 0xf0L) >>> 4)
  }

  private val LenSuffix = ":len".getBytes("UTF-8")

  /** The zw array for one doc — n words of "w<rank>". Called from
    * generated code; must stay a plain static-shaped method. */
  def words(docId: Long): GenericArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val idBytes = java.lang.Long.toString(docId).getBytes("UTF-8")
    val n = (10L + ((u20(md, idBytes, LenSuffix) * 91L) >> 20)).toInt
    val out = new Array[Any](n)
    var i = 1
    while (i <= n) {
      val u = u20(md, idBytes, (":" + i).getBytes("UTF-8"))
      val rank = (((u * u * u) >> 40) * VocabSize) >> 20
      out(i - 1) = UTF8String.fromString("w" + rank)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ZipfExpressions {
  /** Column API for [[ZipfWords]]. */
  def zipfWords(docId: Column): Column =
    Bridge.column(ZipfWords(Bridge.expression(docId)))
}
