package graft.plans

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("TokenStats matches the functions._ formulations") {
    val df = Seq(
      "the quick, brown fox! and  the   lazy dog.",
      "  leading and trailing  ",
      "ALL CAPS THE END",
      "!!!",
      ""
    ).toDF("text")
    val out = df.select(
      TextExpressions.tokenStats($"text", Text.EnStopwords).as("st"),
      Text.tokenCount($"text").cast("long").as("nt"),
      Text.punctCount($"text").cast("long").as("pc"),
      Text.stopwordCount($"text", Text.EnStopwords).cast("long").as("sc"))
    out.collect().foreach { r =>
      val st = r.getStruct(0)
      assert(st.getLong(0) == r.getLong(1), s"n_tokens mismatch: $r")
      assert(st.getLong(1) == r.getLong(2), s"punct mismatch: $r")
      assert(st.getLong(2) == r.getLong(3), s"stopword mismatch: $r")
    }
  }

  test("NfcNormalize: composition, singleton, reorder; already-NFC passes through") {
    val cases = Seq(
      "Cafe\u0301" -> "Caf\u00e9", // combining acute composes
      "A\u030Angstrom" -> "\u00c5ngstrom", // combining ring composes
      "x\u212B" -> "x\u00c5", // ANGSTROM SIGN singleton replacement
      "d\u0307\u0323" -> "\u1e0d\u0307", // reorder: below-dot first, then compose
      "plain ascii" -> "plain ascii",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(TextExpressions.nfcNormalize($"t")).as[String].collect().toSeq
    assert(got == cases.map(_._2), "kernel must match Unicode NFC")
    // reference cross-check: java.text.Normalizer is the contract
    cases.foreach { case (in, out) =>
      assert(java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC) == out)
    }
    // null-safe
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextExpressions.nfcNormalize($"t")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("TokenStats is null-safe") {
    val out = Seq(Option.empty[String], Some("a b")).toDF("text")
      .select(TextExpressions.tokenStats($"text", Nil).as("st"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getStruct(0).getLong(0) == 2L)
  }

  test("WordSegments kernel == declarative sequence/slice formulation") {
    val docs = Seq(
      "one two three four five six seven",   // partial tail (7 = 2×3 + 1)
      "one two three",                        // exact multiple
      "single",                               // shorter than a segment
      "  Mixed   CASE  spacing\there ",       // lowercasing + whitespace runs
      "").toDF("text")
    for (n <- Seq(1, 3, 5)) {
      val declarative = docs.select(
        transform(
          filter(
            sequence(lit(0),
              greatest(size(Text.tokens($"text")) - 1, lit(0)), lit(n)),
            i => i < size(Text.tokens($"text"))),
          i => array_join(slice(Text.tokens($"text"), i + 1, lit(n)), " "))
          .as("segs"))
      val native = docs.select(
        TextExpressions.wordSegments($"text", n).as("segs"))
      assert(native.collect().toSeq == declarative.collect().toSeq,
        s"kernel/declarative divergence at n=$n")
    }
  }
}
