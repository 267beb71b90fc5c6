package graft.operators

import graft.SparkSpec

/** Property check for window-grain exact-substring duplicate marking:
  * on seeded corpora over a tiny vocabulary (so window collisions are
  * frequent), per-doc window/duplicate counts must equal a driver-side
  * brute force computed straight from the definition — every W-token
  * window occurrence counted in a flat map, spans marked when their text
  * occupies >= 2 (doc, position) slots.
  */
class DuplicateSpansPropertySpec extends SparkSpec {
  import spark.implicits._

  private def mod(x: Long, n: Long): Long = ((x % n) + n) % n

  for (seed <- Seq(1L, 7L, 42L)) {
    test(s"duplicateSpans equals brute-force window counting (seed=$seed)") {
      val vocab = Array("ash", "birch", "cedar", "dune", "elm", "fir")
      val docs = (0L until 40L).map { id =>
        val n = 2 + mod(seed * 31 + id * 17, 13).toInt // 2..14 words (some sub-window)
        val words = (0 until n).map(j =>
          vocab(mod(id * 131 + j * (seed + 7), vocab.length).toInt))
        (id, words.mkString(" "))
      }
      val w = 3
      val windows: Map[Long, Seq[String]] = docs.map { case (id, text) =>
        id -> text.split(" ").toSeq.sliding(w).filter(_.size == w)
          .map(_.mkString(" ")).toSeq
      }.toMap
      val occ = windows.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val want = docs.map { case (id, _) =>
        val ws = windows(id)
        (id, ws.size.toLong, ws.count(occ(_) >= 2).toLong)
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", windowTokens = w)
        .select("doc_id", "n_windows", "n_dup_windows")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want,
        s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")
    }
  }
}
