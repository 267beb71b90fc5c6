package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim unit-ish vectors: 1≈2 (cos≈1), 3 orthogonal, 4 opposite of 1
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("knnBruteForce ranks by exact cosine") {
    val out = Similarity.knnBruteForce(
        vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(out.map(_._1) == Seq(2L, 3L, 4L)) // cos: ~0.995, 0.0, -1.0
  }

  test("knnLsh returns correctly-ranked candidates from bucket collisions") {
    val out = Similarity.knnLsh(
        vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", "embedding", k = 3, planes = 2, dim = 4)
      .select("neighbor_id", "cosine", "rank").as[(Long, Double, Int)].collect()
    // candidates are a subset of the brute-force result, ranks consistent
    assert(out.nonEmpty)
    assert(out.sortBy(_._3).map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
  }

  test("knnIvf finds the true neighbor when probing enough cells") {
    val out = Similarity.knnIvf(
        vecs, vecs.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", "embedding", k = 3, nlist = 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.nonEmpty && out.head._1 == 2L) // vec 2 is the true nearest
  }

  test("embeddingNearDup finds the near-identical pair") {
    val out = Similarity.embeddingNearDup(vecs, "vec_id", "embedding",
        threshold = 0.9, bands = 2, bandBits = 2, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(!out.contains((1L, 4L)))
  }

  test("embeddingNearDup emits each pair once even when it collides in several bands") {
    // identical vectors collide in EVERY band; the group-max dedup must
    // collapse the per-band hits to one output row
    val out = Similarity.embeddingNearDup(vecs, "vec_id", "embedding",
        threshold = 0.9, bands = 3, bandBits = 2, dim = 4)
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("embeddingNearDup dim mismatch fails loudly instead of bucketing to 0") {
    val bad = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.embeddingNearDup(bad, "vec_id", "embedding",
        threshold = 0.5, bands = 1, bandBits = 2, dim = 4).collect()
    }
    assert(ex.getMessage.contains("dim mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("dim mismatch")))
  }

  test("bandBitsFor bounds expected bucket size as the corpus grows") {
    assert(Similarity.bandBitsFor(1L << 20, 1024L) == 10)   // 1M / 1k buckets
    assert(Similarity.bandBitsFor(2000L, 1024L) == 1)
    assert(Similarity.bandBitsFor(100L, 1024L) == 1)        // floor at 1 bit
    assert(Similarity.bandBitsFor(1L << 40, 1024L) == 20)   // capped
  }
}
