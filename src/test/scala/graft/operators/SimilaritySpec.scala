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

  test("knnIvf equals knnIvfAgainst over a PERSISTED ivfIndex (round-trip)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val centroids = Array.tabulate(2, 4)((c, d) => ((c * 3 + d) % 3 - 1).toFloat)
    val probes = vecs.filter($"vec_id" === 1L)
    val direct = Similarity.knnIvf(
        vecs, probes, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, nlist = 2, nprobe = 2, trainedCentroids = Some(centroids))
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    Similarity.ivfIndex(vecs, "vec_id", "embedding", centroids)
      .write.mode("overwrite").parquet(tmp)
    val viaIndex = Similarity.knnIvfAgainst(
        probes, spark.read.parquet(tmp), "vec_id", "embedding",
        k = 3, nprobe = 2, centroids = centroids)
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(direct == viaIndex)
  }

  test("knnIvfAgainst probes a stored index without re-assigning the corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    val centroids = Array.tabulate(2, 4)((c, d) => ((c * 3 + d) % 3 - 1).toFloat)
    Similarity.ivfIndex(vecs, "vec_id", "embedding", centroids)
      .write.mode("overwrite").parquet(tmp)
    val plan = Similarity.knnIvfAgainst(
        vecs.filter($"vec_id" === 1L), spark.read.parquet(tmp),
        "vec_id", "embedding", k = 3, nprobe = 2, centroids = centroids)
      .queryExecution.executedPlan.toString
    // the index scan must READ the stored cell, not recompute it: the one
    // parquet scan carries cell in its ReadSchema. Probe cost is then
    // ∝ probe count (probe-side cell sims + the cell equi-join only).
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 1, s"expected exactly one file scan:\n$plan")
    assert(scans.head.contains("cell"), s"index scan must read stored cell:\n$plan")
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

  test("embeddingNearDupAgainst equals the cross-pair slice of the self-join") {
    // banding all vectors and filtering to cross pairs must equal banding
    // the two filtered inputs separately — the oracle's equivalence
    val batchIds = Set(2L, 4L)
    def idx(df: org.apache.spark.sql.DataFrame) =
      Similarity.embeddingBandIndex(df, "vec_id", "embedding",
        bands = 2, bandBits = 2, dim = 4)
    val incr = Similarity.embeddingNearDupAgainst(
        idx(vecs.filter($"vec_id".isin(batchIds.toSeq: _*))),
        idx(vecs.filter(!$"vec_id".isin(batchIds.toSeq: _*))),
        threshold = 0.9)
      .select("id_new", "id_corpus", "cosine").as[(Long, Long, Double)]
      .collect().toSet
    val self = Similarity.embeddingNearDup(vecs, "vec_id", "embedding",
        threshold = 0.9, bands = 2, bandBits = 2, dim = 4)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, c) =>
        if (batchIds.contains(a) && !batchIds.contains(b)) Some((a, b, c))
        else if (batchIds.contains(b) && !batchIds.contains(a)) Some((b, a, c))
        else None
      }.toSet
    assert(incr == self, s"incremental=$incr selfSlice=$self")
    assert(incr.exists(p => p._1 == 2L && p._2 == 1L), "near-dup (2→1) missing")
  }

  test("embeddingNearDupAgainst drops self pairs when the batch is already indexed") {
    // append-then-probe: batch vectors already in the corpus index collide
    // with themselves in every band — the cosine-1.0 (x, x) rows must be
    // filtered while genuine near-dups with other ids still surface
    def idx(df: org.apache.spark.sql.DataFrame) =
      Similarity.embeddingBandIndex(df, "vec_id", "embedding",
        bands = 2, bandBits = 2, dim = 4)
    val pairs = Similarity.embeddingNearDupAgainst(
        idx(vecs.filter($"vec_id" === 2L)), idx(vecs), threshold = 0.9)
      .select("id_new", "id_corpus", "cosine").as[(Long, Long, Double)].collect()
    assert(!pairs.exists(p => p._1 == p._2), s"self pair leaked: ${pairs.toSeq}")
    assert(pairs.exists(p => p._1 == 2L && p._2 == 1L), "near-dup (2→1) missing")
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

  test("randomProject: linearity, determinism, and zero-shuffle plan") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.fill(16)(1.0f)),
      (2L, Array.fill(16)(2.0f)),                 // 2 × vec 1
      (3L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(vecs, "vec_id", "embedding",
      dimIn = 16, dimOut = 4, seed = 21L)
    val m = out.as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(m(1L).size == 4)
    // projection is linear: P(2v) = 2 P(v); P(0) = 0
    assert(m(2L).zip(m(1L)).forall { case (a, b) => a == 2.0 * b })
    assert(m(3L).forall(_ == 0.0))
    // deterministic across runs/partitionings
    val again = Similarity.randomProject(vecs.repartition(3), "vec_id",
        "embedding", 16, 4, 21L)
      .as[(Long, Long, Double)].collect().toSet
    assert(again == out.as[(Long, Long, Double)].collect().toSet)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("randomProject approximately preserves relative distances (JL)") {
    import spark.implicits._
    // three well-separated cluster centers in 32-d; projected distances
    // must keep far pairs farther than near pairs
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32)(rnd.nextFloat())
    val near = base.map(x => x + 0.01f)
    val far = Array.fill(32)(rnd.nextFloat() * 10f)
    val vecs = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val proj = Similarity.randomProject(vecs, "vec_id", "embedding", 32, 8, 21L)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(dist(proj(1L), proj(2L)) < dist(proj(1L), proj(3L)))
  }
}
