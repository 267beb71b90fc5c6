package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Losslessness property check for the prefix-filtered pair core: on an
  * adversarially DENSE corpus (tiny vocabulary → every shingle shared by
  * many docs, the worst case for candidate pruning), the prefix + positional
  * + size-ratio filters must recover EXACTLY the pairs a brute-force
  * all-pairs scan finds — at several thresholds, including ones that
  * exercise the ε-guarded ceil boundaries (0.5, 0.8, 1.0).
  */
class PairMiningPropertySpec extends SparkSpec {
  import spark.implicits._

  // 90 docs over an 8-word vocabulary, 5-40 words each, plus planted exact
  // dups — hash-seeded so the corpus is identical every run
  private lazy val docs = {
    val vocab = Array("red", "blue", "green", "gold", "iron", "salt", "wolf", "moon")
    val base = (0L until 90L).map { id =>
      val words = (1 to (5 + (math.abs(31 * id + 7) % 36)).toInt).map { j =>
        vocab((math.abs(id * 131 + j * 17) % vocab.length).toInt)
      }
      (id, words.mkString(" "))
    }
    val planted = base.map {
      case (id, text) if id % 30 == 7 => (id, base((id + 13).toInt % 90)._2)
      case other => other
    }
    planted.toDF("doc_id", "text")
  }

  private def bruteForce(threshold: Double, containment: Boolean): Set[(Long, Long)] = {
    // all-pairs over the same distinct-shingle space (no suppression at
    // this cap), straight from the definition
    val sets = docs.select(col("doc_id"),
        array_distinct(graft.functions.Text.wordShingles(col("text"), 3)).as("sh"))
      .where(size(col("sh")) > 0)
    val a = sets.toDF("id_a", "sha")
    val b = sets.toDF("id_b", "shb")
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sha"), col("shb"))).cast("double").as("inter"),
        size(col("sha")).cast("double").as("sa"), size(col("shb")).cast("double").as("sb"))
      .where(
        if (containment) col("inter") / least(col("sa"), col("sb")) >= threshold
        else col("inter") / (col("sa") + col("sb") - col("inter")) >= threshold)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
  }

  for (t <- Seq(0.5, 0.8, 1.0)) {
    test(s"ngramJaccard at t=$t finds exactly the brute-force pair set") {
      val got = Dedup.ngramJaccard(docs, "doc_id", "text", 3, t, 1000000L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = bruteForce(t, containment = false)
      assert(got == want,
        s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")
    }

    test(s"overlapPairs at t=$t finds exactly the brute-force pair set") {
      val got = Dedup.overlapPairs(docs, "doc_id", "text", 3, t, 1000000L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = bruteForce(t, containment = true)
      assert(got == want,
        s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")
    }
  }
}
