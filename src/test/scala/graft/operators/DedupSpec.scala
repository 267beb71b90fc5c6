package graft.operators

import graft.SparkSpec

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

  test("minhashLsh surfaces near-dups and exact dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 4L))) // exact dup always collides
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0)
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L))
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
}
