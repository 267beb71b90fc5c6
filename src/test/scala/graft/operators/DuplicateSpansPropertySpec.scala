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

    test(s"removeDuplicateSpans equals brute-force span cutting (seed=$seed)") {
      val vocab = Array("ash", "birch", "cedar", "dune", "elm", "fir")
      val docs = (0L until 40L).map { id =>
        val n = 2 + mod(seed * 31 + id * 17, 13).toInt
        val words = (0 until n).map(j =>
          vocab(mod(id * 131 + j * (seed + 7), vocab.length).toInt))
        (id, words.mkString(" "))
      }
      val w = 3
      // brute force straight from the definition
      val posting: Seq[(Long, Int, String)] = docs.flatMap { case (id, text) =>
        text.split(" ").toSeq.sliding(w).filter(_.size == w).zipWithIndex
          .map { case (win, pos) => (id, pos, win.mkString(" ")) }
      }
      val occ = posting.groupBy(_._3).view.mapValues(_.size).toMap
      val first: Map[String, (Long, Int)] =
        posting.groupBy(_._3).view.mapValues(ps => ps.map(p => (p._1, p._2)).min).toMap
      val cut: Map[Long, Seq[Int]] = posting
        .filter { case (id, pos, win) => occ(win) >= 2 && first(win) != ((id, pos)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val want = docs.map { case (id, text) =>
        val toks = text.split(" ").toSeq
        val positions = cut.getOrElse(id, Nil)
        // islands: break when the next window starts > w past the previous
        val islands = positions.foldLeft(List.empty[(Int, Int)]) {
          case ((s, p) :: rest, q) if q - p <= w => (s, q) :: rest
          case (acc, q) => (q, q) :: acc
        }.reverse.map { case (s, pLast) => (s, pLast + w - 1) }
        val removed = islands.flatMap { case (s, e) => s to e }.toSet
        val clean = toks.zipWithIndex.collect {
          case (t, i) if !removed.contains(i) => t
        }.mkString(" ")
        (id, toks.size.toLong, removed.size.toLong, islands.size.toLong, clean)
      }.toSet
      val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", windowTokens = w)
        .select("doc_id", "n_tokens", "n_removed_tokens", "n_spans", "clean_text")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(got == want,
        s"missing=${(want -- got).toSeq.sorted} extra=${(got -- want).toSeq.sorted}")
      // the removal contract: of every duplicated window text's original
      // occurrences, at most one keeps its full token range uncut
      val removedByDoc: Map[Long, Set[Int]] = want.map(r => r._1 -> {
        val positions = cut.getOrElse(r._1, Nil)
        val islands = positions.foldLeft(List.empty[(Int, Int)]) {
          case ((s, p) :: rest, q) if q - p <= w => (s, q) :: rest
          case (acc, q) => (q, q) :: acc
        }
        islands.flatMap { case (s, pLast) => s to (pLast + w - 1) }.toSet
      }).toMap
      posting.groupBy(_._3).foreach { case (win, ps) =>
        if (occ(win) >= 2) {
          val intact = ps.count { case (id, pos, _) =>
            (pos until pos + w).forall(i => !removedByDoc(id).contains(i))
          }
          assert(intact <= 1, s"window '$win' survives intact $intact times")
        }
      }
    }
  }
}
