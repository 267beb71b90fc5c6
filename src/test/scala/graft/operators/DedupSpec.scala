package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docB = "the quick brown fox jumps over the lazy dog again and again tomorrow" // near-dup of A
  private val docC = "completely different words about spark catalyst optimizer plans here"

  private def docs = Seq(
    (1L, docA), (2L, docB), (3L, docC), (4L, docA) // 4 is exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "dup_count").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngramJaccard finds near-duplicate pairs above threshold") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccard counts doc frequency with a partial aggregate, not a shingle window") {
    val df = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, maxShingleDocFreq = 1000L)
    df.collect() // finalize the adaptive plan before asserting on it
    val plan = df.queryExecution.executedPlan.toString
    // a window over the shingle key has no map-side combine: every occurrence
    // of a hot (stopword) shingle would cross the network into one task just
    // to be discarded — the formulation under test must not contain one
    assert(!plan.contains("windowspecdefinition(shingle"),
      s"hot-shingle suppression regressed to a window over the shingle key:\n$plan")
    // the doc-frequency count must be a real aggregate on the shingle key
    // (partial mode collapses hot keys map-side before the shuffle) ...
    assert(plan.contains("partial_count"), s"no partial aggregate on the DF-count path:\n$plan")
    // ... and the tiny hot set must come back as a broadcast anti-join that
    // does not reshuffle the posting list
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"hot set is not applied as a broadcast anti-join:\n$plan")
  }

  test("ngramJaccard hot-shingle cap: exact dups still reach jaccard 1.0 after suppression") {
    // cap=2 suppresses every shingle shared by docs 1, 2 and 4 (df=3) but
    // keeps the df=2 shingles of the exact-dup pair (1,4); since set sizes
    // are counted over the SAME filtered space, (1,4) must still score 1.0
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, maxShingleDocFreq = 2L)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val m = out.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 4L)) == 1.0)
  }

  test("overlapPairs catches a quote inclusion that jaccard misses") {
    // doc 6 embeds doc 5 verbatim inside much longer unrelated text: the
    // overlap coefficient is 1.0 while jaccard stays far below threshold
    val quote = "to be or not to be that is the question"
    val host = quote + " " + (1 to 60).map(i => s"filler$i word$i").mkString(" ")
    val d = Seq((5L, quote), (6L, host), (7L, docC)).toDF("doc_id", "text")
    val over = Dedup.overlapPairs(d, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b", "overlap").as[(Long, Long, Double)].collect().toSeq
    assert(over == Seq((5L, 6L, 1.0)), s"expected containment pair, got $over")
    val jac = Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((5L, 6L)), "jaccard should miss the quote inclusion")
  }

  test("overlapPairs equals jaccard score shape on exact duplicates") {
    val over = Dedup.overlapPairs(docs, "doc_id", "text", 3, 0.99)
      .select("id_a", "id_b", "overlap").as[(Long, Long, Double)].collect().toSet
    assert(over.contains((1L, 4L, 1.0))) // exact dup pair
  }

  test("minhashLsh surfaces near-dups and exact dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 4L))) // exact dup always collides
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0)
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashLshAgainst finds batch-vs-corpus pairs and nothing batch-internal") {
    // batch = {2, 4}: 2 is a near-dup of corpus doc 1, 4 an exact dup of 1.
    // the (2,4) batch-internal pair must NOT appear — that's minhashLsh's job
    val corpus = Seq((1L, docA), (3L, docC)).toDF("doc_id", "text")
    val batch = Seq((2L, docB), (4L, docA)).toDF("doc_id", "text")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashIndex(df, "doc_id", "text", shingleLen = 3, numHashes = 32, bands = 8)
    val pairs = Dedup.minhashLshAgainst(idx(batch), idx(corpus), 32, 0.5)
      .select("id_new", "id_corpus", "est_jaccard").as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((4L, 1L)) && pairs.find(p => p._1 == 4L).get._3 == 1.0)
    assert(!ids.exists(p => p._2 == 3L), "unrelated corpus doc matched")
    assert(!ids.contains((2L, 4L)) && !ids.contains((4L, 2L)), "batch-internal pair leaked")
  }

  test("minhashLshAgainst drops self pairs when the batch is already indexed") {
    // append-then-probe: the batch was appended to the corpus index BEFORE
    // probing — every batch doc collides with itself in all bands and must
    // not be reported as its own duplicate; true dups still surface
    val corpus = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docA))
      .toDF("doc_id", "text")
    val batch = Seq((4L, docA)).toDF("doc_id", "text")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashIndex(df, "doc_id", "text", shingleLen = 3, numHashes = 32, bands = 8)
    val pairs = Dedup.minhashLshAgainst(idx(batch), idx(corpus), 32, 0.5)
      .select("id_new", "id_corpus", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(!pairs.exists(p => p._1 == p._2), s"self pair leaked: ${pairs.toSeq}")
    assert(pairs.exists(p => p._1 == 4L && p._2 == 1L && p._3 == 1.0))
  }

  test("minhashLshAgainst equals the cross-pair slice of the self-join") {
    // banding all docs and filtering to cross pairs must equal banding the
    // two filtered inputs separately — the equivalence the oracle relies on
    val batchIds = Set(2L, 4L)
    val batch = docs.filter($"doc_id".isin(batchIds.toSeq: _*))
    val corpus = docs.filter(!$"doc_id".isin(batchIds.toSeq: _*))
    def idx(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashIndex(df, "doc_id", "text", shingleLen = 3, numHashes = 32, bands = 8)
    val incr = Dedup.minhashLshAgainst(idx(batch), idx(corpus), 32, 0.5)
      .select("id_new", "id_corpus", "est_jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val self = Dedup.minhashLsh(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        if (batchIds.contains(a) && !batchIds.contains(b)) Some((a, b, j))
        else if (batchIds.contains(b) && !batchIds.contains(a)) Some((b, a, j))
        else None
      }.toSet
    assert(incr == self, s"incremental=$incr selfSlice=$self")
  }

  test("duplicateSpans marks offset-shifted copies and intra-doc repeats") {
    val corpus = Seq(
      // 1 and 2 share "alpha beta gamma delta epsilon" at DIFFERENT word
      // offsets (0 vs 2) — invisible to aligned segments, a span dup here
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "pre pad alpha beta gamma delta epsilon post"),
      // 3 repeats a 5-gram inside itself (positions 0 and 5)
      (3L, "one two three four five one two three four five"),
      // 4 shares nothing; 5 is too short for any window
      (4L, "solo words that match nothing else at all"),
      (5L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(corpus, "doc_id", "text", windowTokens = 5)
      .select("doc_id", "n_windows", "n_dup_windows").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (4L, 1L))   // 8 tokens -> 4 windows, 1 shared with doc 2
    assert(out(2L) == (4L, 1L))
    assert(out(3L) == (6L, 2L))   // "one..five" at pos 0 and 5 both marked
    assert(out(4L) == (4L, 0L))
    assert(out(5L) == (0L, 0L))   // sub-window doc: zero windows, ratio null
  }

  test("connectedComponents labels every node with the min reachable id") {
    // chain 1-2-3-4-5 (diameter 4 → several propagation rounds) + pair 10-11
    // + isolated 20 (absent from output, present only via consumer coalesce)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (11L, 10L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents refuses to return unconverged components") {
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
    }
  }

  test("simhashNearDup: exact dup has hamming 0, unrelated doc excluded") {
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text", shingleLen = 3, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 4L)) == 0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("segmentDedup removes hot segments and reassembles text in order") {
    // "h1 h2 h3" opens 4 of 5 docs (df=4 > minHotDf=3) — boilerplate;
    // every other 3-token segment is unique to its doc
    val boiler = "h1 h2 h3"
    val ds = Seq(
      (1L, s"$boiler a1 a2 a3 a4 a5 a6"),
      (2L, s"$boiler b1 b2 b3"),
      (3L, s"$boiler c1 c2 c3"),
      (4L, s"$boiler d1 d2 d3"),
      (5L, "e1 e2 e3 e4 e5 e6")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(ds, "doc_id", "text", segWords = 3)
      .select($"doc_id", $"n_segs", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 1L, "a1 a2 a3 a4 a5 a6"),
      (2L, 2L, 1L, "b1 b2 b3"),
      (3L, 2L, 1L, "c1 c2 c3"),
      (4L, 2L, 1L, "d1 d2 d3"),
      (5L, 2L, 0L, "e1 e2 e3 e4 e5 e6")))
  }

  test("segmentDedup: all-boilerplate doc survives with empty text") {
    val b = "h1 h2 h3"
    val ds = (1L to 4L).map(i => (i, b)).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(ds, "doc_id", "text", segWords = 3)
      .select($"doc_id", $"n_removed", $"clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == (1L to 4L).map(i => (i, 1L, "")))
  }

  test("segmentDedup hot threshold scales with corpus size") {
    // 600 docs sharing a segment with df=5: threshold max(3, 600/100)=6,
    // so df=5 is NOT hot at this corpus size (would be at 400 docs)
    val shared = (1L to 5L).map(i => (i, "s1 s2 s3"))
    val filler = (6L to 600L).map(i => (i, s"u${i}a u${i}b u${i}c"))
    val ds = (shared ++ filler).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(ds, "doc_id", "text", segWords = 3)
    assert(out.agg(sum($"n_removed")).head().getLong(0) == 0L)
    // at 400 docs the same df=5 segment IS hot (threshold max(3, 4)=4)
    val ds2 = (shared ++ filler.take(395)).toDF("doc_id", "text")
    val out2 = Dedup.segmentDedup(ds2, "doc_id", "text", segWords = 3)
    assert(out2.agg(sum($"n_removed")).head().getLong(0) == 5L)
  }

  test("derivedDocFreqCap: max(floor, budget*docs/postings), integer-exact") {
    // 4 docs, 12 distinct 3-shingles each (13-14 words) -> postings ~ 48:
    // 16384*4/48 = 1365 (floor division), above the 128 floor
    val posting = docs
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        org.apache.spark.sql.functions.explode(
          graft.functions.Text.wordShingles(
            org.apache.spark.sql.functions.col("text"), 3)).as("shingle"))
    val nDocs = 4L
    val nPostings = posting.count()
    assert(Dedup.derivedDocFreqCap(posting) ==
      math.max(128L, 16384L * nDocs / nPostings))
    // the floor binds when docs are shingle-dense: budget/perDoc < 128
    val dense = (1L to 3L).map(i =>
      (i, (1 to 300).map(w => s"w${(w + i) % 310}").mkString(" ")))
      .toDF("doc_id", "text")
    val densePosting = dense
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        org.apache.spark.sql.functions.explode(
          graft.functions.Text.wordShingles(
            org.apache.spark.sql.functions.col("text"), 3)).as("shingle"))
    assert(16384L * 3L / densePosting.count() < 128L, "fixture not dense enough")
    assert(Dedup.derivedDocFreqCap(densePosting) == 128L)
    // the sentinel default routes through the derivation and equals the
    // explicitly-passed derived value, row for row
    val viaSentinel = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .collect().toSet
    val viaExplicit = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5,
      maxShingleDocFreq = Dedup.derivedDocFreqCap(posting)).collect().toSet
    assert(viaSentinel == viaExplicit)
  }

  test("exactAgainst: decisions, batch keepers, and index-side batch exclusion") {
    // corpus: 1=A, 3=C; batch: 5=A (corpus dup), 10=B, 20=B (intra-batch
    // dup of 10), 30=D (genuinely new). B exists ONLY in the batch — the
    // exclusion case: it must never report dup_corpus.
    val corpus = Seq((1L, docA), (3L, docC)).toDF("doc_id", "text")
    val batch = Seq((5L, docA), (10L, docB), (20L, docB), (30L, "brand new content here"))
      .toDF("doc_id", "text")
    val idx = Dedup.fingerprintIndex(corpus, "doc_id", "text")
    val out = Dedup.exactAgainst(idx, batch, "doc_id", "text")
      .select("doc_id", "status", "keep_id").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (5L, "dup_corpus", 1L),
      (10L, "new", 10L),
      (20L, "dup_batch", 10L),
      (30L, "new", 30L)))
    // append-only merge: index ∪ the batch's 'new' rows covers exactly the
    // full corpus's fingerprint set (the incremental contract)
    val merged = idx.select("fingerprint").union(
        Dedup.exactAgainst(idx, batch, "doc_id", "text")
          .filter($"status" === "new").select("fingerprint"))
      .as[String].collect().toSet
    val full = Dedup.fingerprintIndex(corpus.union(batch), "doc_id", "text")
      .select("fingerprint").as[String].collect().toSet
    assert(merged == full)
  }

  test("mergeIndex: append-only round-trip — a second batch probes the merged " +
      "index exactly as it would a from-scratch rebuild") {
    val corpus = Seq((7L, docA), (3L, docC)).toDF("doc_id", "text")
    val batch = Seq((5L, docA), (10L, docB), (20L, docB)).toDF("doc_id", "text")
    val batch2 = Seq((2L, docA), (4L, docB), (6L, "zz unseen zz"),
      (8L, "zz unseen zz")).toDF("doc_id", "text")
    val idx = Dedup.fingerprintIndex(corpus, "doc_id", "text")
    val merged = Dedup.mergeIndex(idx,
      Dedup.exactAgainst(idx, batch, "doc_id", "text"))
    val rebuilt = Dedup.fingerprintIndex(
      corpus.unionByName(batch), "doc_id", "text")
    // fingerprint coverage is identical
    assert(merged.select("fingerprint").as[String].collect().toSet ==
      rebuilt.select("fingerprint").as[String].collect().toSet)
    // a second batch gets the same per-doc DECISIONS from either index
    // (statuses depend only on the fingerprint set)
    def dec(i: org.apache.spark.sql.DataFrame) =
      Dedup.exactAgainst(i, batch2, "doc_id", "text")
        .select("doc_id", "status").as[(Long, String)].collect().toSet
    assert(dec(merged) == dec(rebuilt))
    val viaMerged = Dedup.exactAgainst(merged, batch2, "doc_id", "text")
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    // keep_id STABILITY, the documented divergence from a rebuild: docA
    // lives in corpus (id 7) AND batch (id 5) — the merged index keeps the
    // corpus canonical 7 where a rebuild would re-elect the global min 5
    assert(viaMerged(2L) == 7L)
    // a fingerprint the batch introduced keeps the batch keeper (docB → 10)
    assert(viaMerged(4L) == 10L)
    // the batch delta row carries the batch occurrence count (docB twice)
    assert(merged.filter($"keep_id" === 10L).select("dup_count")
      .as[Long].head() == 2L)
  }

  test("exactAgainst probes the index by equi-join — no corpus re-group in the plan") {
    val corpus = Seq((1L, docA), (3L, docC)).toDF("doc_id", "text")
    val batch = Seq((5L, docA), (10L, docB)).toDF("doc_id", "text")
    // the production shape: the index is a PERSISTED table, not a live
    // grouped view — exactAgainst must touch it only through the join
    val dir = java.nio.file.Files.createTempDirectory("fpidx").toString
    Dedup.fingerprintIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val out = Dedup.exactAgainst(spark.read.parquet(dir), batch, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one aggregate-free probe: no HashAggregate may touch the index side
    // (the corpus is never re-grouped; the only window is the batch's)
    assert(!plan.contains("HashAggregate"),
      s"index side re-aggregated — the corpus-scale contract broke:\n$plan")
  }

  test("segmentDedup marks hot segments via a broadcast join, no seg shuffle join") {
    val ds = (1L to 20L).map(i => (i, s"h1 h2 h3 w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(ds, "doc_id", "text", segWords = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast mark join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
