package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight planted clusters around (0,0,...) and (10,10,...)
  private def clustered = (0L until 40L).map { i =>
    val base = if (i % 2 == 0) 0.0f else 10.0f
    (i, Array.tabulate(4)(d => base + (i % 5) * 0.01f + d * 0.001f))
  }.toDF("vec_id", "embedding")

  test("lloyd separates planted clusters and assigns every vector once") {
    val out = KMeans.lloyd(clustered, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cell").as[(Long, Long)].collect()
    assert(out.length == 40)
    val byParity = out.groupBy(_._1 % 2).map { case (p, rs) => p -> rs.map(_._2).toSet }
    // all evens land in one cell, all odds in the other
    assert(byParity(0L).size == 1 && byParity(1L).size == 1)
    assert(byParity(0L) != byParity(1L))
  }

  test("assignment and distances are bit-identical under any partitioning") {
    val a = KMeans.lloyd(clustered.repartition(7), "vec_id", "embedding", 2, 2)
      .select("vec_id", "cell", "dist2").as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = KMeans.lloyd(clustered.coalesce(1), "vec_id", "embedding", 2, 2)
      .select("vec_id", "cell", "dist2").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // exact doubles, not approx: the quantized-sum claim
  }

  test("assignment is scan-side: no Exchange in the assign plan") {
    val centroids = KMeans.seedSmallestIds(clustered, "vec_id", "embedding", 2)
    val phys = KMeans.assign(clustered, "vec_id", "embedding", centroids)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"assign must not shuffle the corpus:\n$phys")
  }

  // ten tight planted clusters with ids ORDERED BY CLUSTER, so the ten
  // smallest ids all sit in cluster 0 — the adversarial case for
  // smallest-id seeding (every seed lands in one region)
  private def adversarial = (0L until 300L).map { i =>
    val c = (i / 30L).toDouble
    (i, Array.tabulate(4)(d => (10.0 * c + (i % 7) * 0.01 + d * 0.001).toFloat))
  }.toDF("vec_id", "embedding")

  private def sse(assigned: org.apache.spark.sql.DataFrame): Double =
    assigned.agg(sum(col("dist2"))).head().getDouble(0)

  test("k-means|| seeding beats smallest-id seeding on adversarially ordered ids") {
    val smallest = sse(KMeans.lloyd(adversarial, "vec_id", "embedding", k = 10, iters = 3))
    val kmpp = sse(KMeans.lloydPp(adversarial, "vec_id", "embedding", k = 10, iters = 3,
      rounds = 3, ell = 20, seed = 29L))
    // smallest-id puts all ten seeds in cluster 0; D²-oversampling spreads
    // candidates across clusters and the heaviest-k reduction keeps the
    // cores, so the SSE gap is an order of magnitude, not a margin
    assert(kmpp < smallest / 5.0,
      s"k-means|| SSE $kmpp should be far below smallest-id SSE $smallest")
  }

  test("k-means|| candidate construction is partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      KMeans.kmeansParallelCandidates(df, "vec_id", "embedding",
        rounds = 2, ell = 8, seed = 29L)
        .map { case (id, v, w) => (id, v.toSeq, w) }.sortBy(_._1).toSeq
    assert(run(adversarial.repartition(7)) == run(adversarial.coalesce(1)))
  }

  test("k-means|| candidates are corpus members and their weights cover the corpus") {
    val byId = (0L until 300L).map { i =>
      val c = (i / 30L).toDouble
      i -> Array.tabulate(4)(d => (10.0 * c + (i % 7) * 0.01 + d * 0.001).toFloat)
    }.toMap
    val cands = KMeans.kmeansParallelCandidates(adversarial, "vec_id", "embedding",
      rounds = 2, ell = 8, seed = 29L)
    assert(cands.nonEmpty)
    cands.foreach { case (id, v, _) =>
      assert(v.toSeq == byId(id).map(_.toDouble).toSeq, s"candidate $id not a corpus vector")
    }
    assert(cands.map(_._3).sum == 300L, "every corpus point weighs exactly one candidate")
    val ids = cands.map(_._1)
    assert(ids.distinct.length == ids.length, "a candidate may only be selected once")
  }

  test("seedKmeansParallel returns at most k seeds, heaviest candidates first") {
    val cands = KMeans.kmeansParallelCandidates(adversarial, "vec_id", "embedding",
      rounds = 3, ell = 20, seed = 29L)
    val seeds = KMeans.seedKmeansParallel(adversarial, "vec_id", "embedding",
      k = 10, rounds = 3, ell = 20, seed = 29L)
    assert(seeds.length == math.min(10, cands.length))
    val expected = cands.sortBy { case (id, _, w) => (-w, id) }.take(10)
      .map(_._1).sorted.toSeq
    assert(seeds.map(_._1).toSeq == expected)
  }

  test("updateCentroids averages exactly per cell and drops unassigned cells") {
    val assigned = Seq(
      (1L, Array(1.0f, 3.0f), 0L),
      (2L, Array(3.0f, 5.0f), 0L)
    ).toDF("vec_id", "embedding", "cell")
    val got = KMeans.updateCentroids(assigned, "embedding")
    assert(got.length == 1)
    assert(got.head._1 == 0L)
    assert(got.head._2.toSeq == Seq(2.0, 4.0)) // small ints: quantization exact
  }

  test("two-level assignment: fine cell is inside the coarse cell, d2 exact") {
    val k = 6 // k1 = ceil(sqrt 6) = 3, k2 = 2
    val model = KMeans.twoLevelModel(clustered, "vec_id", "embedding", k, iters = 2)
    assert(model.coarse.length <= 3 && model.fineCells <= k + 2)
    val out = KMeans.assignTwoLevel(clustered, "vec_id", "embedding", model)
      .select(col("vec_id"), col("ccell"), col("cell"), col("dist2"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 40)
    val vecsById = clustered.as[(Long, Array[Float])].collect().toMap
    out.foreach { case (id, ccell, cell, d2) =>
      val group = model.sub(ccell) // throws if ccell is not a coarse cell
      // fine cell must be one of the row's OWN coarse cell's sub-cells …
      assert(group.exists(_._1 == cell), s"row $id: $cell not in coarse $ccell")
      // … and (d2, cell) must be the exact argmin over that group only,
      // with the sequential-fold order and the (d2, cell-asc) tie rule
      val v = vecsById(id).map(_.toDouble)
      val best = group.sortBy(_._1).map { case (c, w) =>
        var s = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - w(i); s += d * d; i += 1 }
        (s, c)
      }.minBy(identity)
      assert(best == ((d2, cell)), s"row $id: got ($d2,$cell), want $best")
    }
  }

  test("two-level assignment is bit-identical under any partitioning") {
    val m7 = KMeans.twoLevelModel(clustered.repartition(7), "vec_id", "embedding", 6, 2)
    val m1 = KMeans.twoLevelModel(clustered.coalesce(1), "vec_id", "embedding", 6, 2)
    assert(m7.coarse.map(c => (c._1, c._2.toSeq)).toSeq ==
      m1.coarse.map(c => (c._1, c._2.toSeq)).toSeq)
    assert(m7.sub.view.mapValues(_.map(c => (c._1, c._2.toSeq)).toSeq).toMap ==
      m1.sub.view.mapValues(_.map(c => (c._1, c._2.toSeq)).toSeq).toMap)
    val a = KMeans.assignTwoLevel(clustered.repartition(7), "vec_id", "embedding", m7)
      .select("vec_id", "cell", "dist2").as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = KMeans.assignTwoLevel(clustered.coalesce(1), "vec_id", "embedding", m1)
      .select("vec_id", "cell", "dist2").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
