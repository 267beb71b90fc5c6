package graft.operators

import graft.SparkSpec
import graft.plans.HashKernels
import org.apache.spark.unsafe.types.UTF8String

class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256
  private def bucket(tri: String, seed: Long): Int =
    math.floorMod(HashKernels.fnvMix(UTF8String.fromString(tri), seed), B.toLong).toInt

  test("hand-planted per-class weights classify by their signal trigram") {
    val seed = 7L
    // class i scores +100 whenever its signature trigram appears
    val sigs = Seq("aax", "bbx", "ccx")
    val weights = sigs.map { t =>
      val w = new Array[Int](B)
      w(bucket(t, seed)) = 100
      w
    }
    val docs = Seq(
      (1L, "zzz aax zzz"), // one 'aax' trigram
      (2L, "qq bbx qq"),
      (3L, "ccx"),
      (4L, "")) // no features: bias logits, tie -> class 0
      .toDF("doc_id", "text")
    val out = LangClassifier.classify(docs, "doc_id", "text",
        labels = Seq("alpha", "beta", "gamma"), weightsPerClass = weights,
        scale = 1.0, bias = 0.0, seed = seed)
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    assert(out(0)._3 == "alpha" && out(0)._4 > 0.0)
    assert(out(1)._3 == "beta" && out(1)._4 > 0.0)
    assert(out(2)._3 == "gamma")
    assert(out(3) == ((4L, 0L, "alpha", 0.0)), s"empty text: ${out(3)}")
  }

  test("argmax ties break toward the smaller class index") {
    // identical weight vectors for every class -> all logits equal
    val w = QualityClassifier.seededWeights(B, 5L)
    val out = LangClassifier.classify(
        Seq((1L, "some text here")).toDF("doc_id", "text"),
        "doc_id", "text", labels = Seq("x", "y", "z"),
        weightsPerClass = Seq(w, w, w), scale = 0.05, bias = 0.0, seed = 5L)
      .as[(Long, Long, String, Double)].collect()
    assert(out.head._3 == "x")
  }

  test("n_features counts char trigrams and sums match a driver-side replay") {
    val seed = 53L
    val weights = (0 until 2).map(i => QualityClassifier.seededWeights(B, 101L + i))
    val text = "Hello WORLD"
    val lower = text.toLowerCase
    val tris = (0 to lower.length - 3).map(i => lower.substring(i, i + 3))
    val sums = weights.map(w => tris.map(t => w(bucket(t, seed)).toLong).sum)
    val logits = sums.map(s => 0.0 + 0.05 * (s.toDouble / tris.length.toDouble))
    val expectLang = if (logits(0) >= logits(1)) "a" else "b"
    val out = LangClassifier.classify(
        Seq((9L, text)).toDF("doc_id", "text"), "doc_id", "text",
        labels = Seq("a", "b"), weightsPerClass = weights,
        scale = 0.05, bias = 0.0, seed = seed)
      .as[(Long, Long, String, Double)].collect().head
    assert(out._2 == tris.length.toLong)
    assert(out._3 == expectLang)
    assert(out._4 == logits.max)
  }

  test("native kernel matches the per-trigram formula on multibyte text") {
    // the one-pass TrigramClassSums kernel folds FNV over each trigram's
    // UTF-8 byte RANGE of the lowercased string — must be bit-identical
    // to hashing the materialized substring, including across multibyte
    // code points
    val seed = 11L
    val text = "Héllo Wörld — ça va? ÆØÅ"
    val lower = text.toLowerCase
    val cps = lower.codePoints().toArray
    val tris = (0 to cps.length - 3).map(i =>
      new String(cps, i, 3))
    val weights = (0 until 3).map(i => QualityClassifier.seededWeights(B, 70L + i))
    val expSums = weights.map(w => tris.map(t => w(bucket(t, seed)).toLong).sum)
    val expLogits = expSums.map(s => 0.1 + 0.05 * (s.toDouble / tris.length))
    val expBest = expLogits.zipWithIndex.maxBy { case (l, i) => (l, -i) }
    val out = LangClassifier.classify(
        Seq((5L, text)).toDF("doc_id", "text"), "doc_id", "text",
        labels = Seq("x", "y", "z"), weightsPerClass = weights,
        scale = 0.05, bias = 0.1, seed = seed)
      .as[(Long, Long, String, Double)].collect().head
    assert(out._2 == tris.length.toLong, s"n_features ${out._2} != ${tris.length}")
    assert(out._4 == expBest._1, s"logit ${out._4} != ${expBest._1}")
    assert(out._3 == Seq("x", "y", "z")(expBest._2))
  }

  test("inference is scan-side: no exchange in the plan") {
    val weights = (0 until 4).map(i => QualityClassifier.seededWeights(B, 101L + i))
    val phys = LangClassifier.classify(
        Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text",
        labels = Seq("en", "de", "fr", "es"), weightsPerClass = weights,
        scale = 0.05, bias = 0.0, seed = 53L)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"classify must not shuffle:\n$phys")
  }
}
