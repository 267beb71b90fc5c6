package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the data-parallel graph-ANN operator (Similarity.nswIndex /
  * knnGraphSearch — the HNSW-family answer, see the nswIndex scaladoc for
  * the decision against literal HNSW's serial insertion).
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic corpus: `clusters` well-separated centers,
    * members jittered around them; ids striped across clusters so id
    * ranges carry no cluster structure. */
  private def corpus(n: Int, clusters: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(clusters, 64)(rnd.nextGaussian().toFloat * 5f)
    (0 until n).map { i =>
      val c = centers(i % clusters)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.3f))
    }.toDF("vec_id", "embedding")
  }

  private def asPairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("tiny corpus (graph ~complete at degree): beam search IS exact brute-force top-k") {
    val emb = corpus(60, 3, seed = 7L)
    val probes = emb.filter(col("vec_id") < 6)
    val got = Similarity.knnGraph(emb, probes,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    val brute = Similarity.knnBruteForce(emb, probes,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    assert(asPairs(got) == asPairs(brute),
      "with buckets ≥ corpus and degree-16 edges the walk must find the exact answer")
  }

  test("near adjacency respects the degree bound and carries exact cosines") {
    val emb = corpus(300, 4, seed = 11L)
    val idx = Similarity.nswIndex(emb, "vec_id", "embedding",
      degree = 8, fineBits = Similarity.bandBitsFor(300, 96))
    val perSrc = idx.near.groupBy(col("src")).agg(count(lit(1)).as("d")).collect()
    assert(perSrc.forall(_.getLong(1) <= 8), "out-degree bound")
    // every edge's stored cosine equals the exact recomputed cosine
    val v = emb.select(col("vec_id"), col("embedding"))
    val recheck = idx.near
      .join(v.toDF("src", "_a"), "src")
      .join(v.toDF("dst", "_b"), "dst")
      .where(abs(col("cosine") -
        graft.functions.Vectors.cosine(col("_a"), col("_b"))) > 1e-12)
      .count()
    assert(recheck == 0, "adjacency cosines are the exact pair cosines")
  }

  test("deterministic: two independent builds+searches agree row for row") {
    val emb = corpus(400, 5, seed = 13L)
    val probes = emb.filter(col("vec_id") < 8)
    def run() = Similarity.knnGraph(emb, probes,
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("query-local hub entry: a probe far from the global entries still finds its cluster") {
    // global entries are the smallest ids; ids stripe across clusters, so a
    // probe's true neighbors live in its own cluster and the walk must get
    // there — plant an exact near-duplicate and demand it at rank 1
    val rnd = new scala.util.Random(17L)
    val base = corpus(500, 8, seed = 17L).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probeVec = base.find(_._1 == 377L).get._2
    val planted = (9001L, probeVec.map(x => x + rnd.nextGaussian().toFloat * 0.01f))
    val emb = (base :+ planted).toSeq.toDF("vec_id", "embedding")
    val got = Similarity.knnGraph(emb, emb.filter(col("vec_id") === 377L),
      "vec_id", "embedding", "vec_id", "embedding", k = 3)
    val top = got.orderBy(col("rank")).collect()
    assert(top.head.getLong(1) == 9001L,
      s"planted near-duplicate must be rank 1, got ${top.map(_.getLong(1)).mkString(",")}")
  }

  test("incremental probes: a corpus-only index serves a new batch, no rebuild") {
    val all = corpus(500, 6, seed = 29L)
    val batch = all.filter(col("vec_id") < 8)
    val base = all.filter(col("vec_id") >= 8)
    val idx = Similarity.nswIndex(base, "vec_id", "embedding",
      degree = 16, fineBits = Similarity.bandBitsFor(492, 96))
    // the persistable artifact never contains a batch id — index-side
    // exclusion is what makes the probe pass rebuild-free
    val batchIds = (0L until 8L).toSet
    val idxIds = (idx.near.select(col("src")).collect() ++
      idx.near.select(col("dst")).collect() ++
      idx.hubs.select(col("hub")).collect()).map(_.getLong(0)).toSet
    assert(idxIds.intersect(batchIds).isEmpty, "batch ids leaked into the index")
    // searching the pre-built index == the end-to-end incremental call
    val viaIndex = Similarity.knnGraphSearch(idx, base, batch,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, beam = 8, hops = 4, entries = 4)
      .collect().map(_.toString).sorted.toSeq
    val endToEnd = Similarity.knnGraph(base, batch,
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == endToEnd)
    assert(endToEnd.nonEmpty)
    // buildBudget is reachable end-to-end (the cluster-scale degree
    // path); below the 1e5-row boundary degreeFor's base floor makes any
    // budget a no-op, so the results must be identical — the wiring pin.
    val budgeted = Similarity.knnGraph(base, batch,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        buildBudget = 1L << 20)
      .collect().map(_.toString).sorted.toSeq
    assert(budgeted == endToEnd)
  }

  test("degreeFor: the measured log-N rule under the n·degree² build budget") {
    // below the measured 1e5-row collapse boundary: HNSW's production M
    assert(Similarity.degreeFor(500L) == 16)
    assert(Similarity.degreeFor(99999L) == 16)
    // the sf10 measurement: degree 32 recovers recall 0.10 → 0.225-0.30
    assert(Similarity.degreeFor(100000L) == 32)
    assert(Similarity.degreeFor(200000L) == 32)
    // sf100-class: growth says 64, the default 2^31 budget halves it back
    // (2e6·64² ≈ 8.2e9 > 2^31; 2e6·32² ≈ 2.0e9 fits). MEASURED at the
    // capped degree (n=2M uniform, §6 r16): recall@5 = 0.100 with the
    // walk budget FLAT (beam 8/16/32 all 0.100) — the only lever at the
    // budget cap is the degree a bigger budget buys, hence the knob
    // below and its knnGraph passthrough.
    assert(Similarity.degreeFor(2000000L) == 32)
    // a cluster-sized budget follows the log-N rule further
    assert(Similarity.degreeFor(2000000L, buildBudget = 1L << 34) == 64)
    // budget floor: degree never drops below base
    assert(Similarity.degreeFor(100000000L) == 16)
    // beam follows the degree above the base (measured: at degree 32 the
    // beam is the lever again, 0.225 → 0.300 from beam 8 → 32)
    assert(Similarity.beamFor(16) == 8)
    assert(Similarity.beamFor(32) == 32)
  }

  test("sliced build (buildSlices > 1) is row-identical to the single-job build") {
    // the sf100 disk-bound contingency (§6 r17): hash-partitioning the src
    // space into S sequential rescore/rank jobs must not change a single
    // edge — topDegree ranks per src and every per-src candidate set lands
    // intact in that src's slice
    val emb = corpus(500, 5, seed = 31L)
    val bits = Similarity.bandBitsFor(500, 96)
    def edges(slices: Int): Set[(Long, Long, Double)] =
      Similarity.nswIndex(emb, "vec_id", "embedding", degree = 8,
          fineBits = bits, buildSlices = slices)
        .near.select(col("src"), col("dst"), col("cosine")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges(3) == edges(1),
      "sliced and single-job builds must produce the identical graph")
  }

  test("rescoreBroadcastBound: scales down with cluster width, capped at 1 GiB") {
    // broadcast network cost is bytes × executors: the bound caps total
    // re-send traffic at 32 GiB and never exceeds the single-box 1 GiB
    assert(Similarity.rescoreBroadcastBound(1) == (1L << 30))
    assert(Similarity.rescoreBroadcastBound(0) == (1L << 30)) // defensive floor
    assert(Similarity.rescoreBroadcastBound(32) == (1L << 30))
    assert(Similarity.rescoreBroadcastBound(64) == (1L << 29))
    assert(Similarity.rescoreBroadcastBound(1000) == (32L << 30) / 1000)
    // at 1000 executors a 600 MB vector table (n=2M × 64 floats) exceeds
    // the ~32 MiB bound — the equi-join shape returns instead of ~600 GB
    // of broadcast re-sends
    assert(2000000L * (64 * 4L + 48L) > Similarity.rescoreBroadcastBound(1000))
  }

  test("executorCountFrom: instances, then dynamic-allocation ceiling, then live") {
    // the r17 verdict flag: dynamic-allocation clusters don't set
    // spark.executor.instances, so the width read 1 and the re-send bill
    // came back — the resolution order below is the fix, pinned here
    def rule(conf: Map[String, String], live: Int = 0): Int =
      Similarity.executorCountFrom(conf.get, live)
    // local mode, nothing set: the live path (driver-only status) → 1
    assert(rule(Map.empty) == 1)
    // dynamic allocation enabled with an explicit ceiling: the ceiling
    // (the width the cluster may GROW to mid-job)
    val dyn = Map("spark.dynamicAllocation.enabled" -> "true",
      "spark.dynamicAllocation.maxExecutors" -> "100")
    assert(rule(dyn) == 100)
    // ceiling unset (unbounded dynamic allocation): falls to live count
    assert(rule(Map("spark.dynamicAllocation.enabled" -> "true"), live = 37) == 37)
    // the ceiling is ignored when dynamic allocation is OFF
    assert(rule(Map("spark.dynamicAllocation.maxExecutors" -> "100")) == 1)
    // explicit static instances wins over everything
    assert(rule(dyn + ("spark.executor.instances" -> "7")) == 7)
    // malformed / non-positive values are ignored, not thrown
    assert(rule(dyn + ("spark.executor.instances" -> "not-a-number")) == 100)
    assert(rule(dyn + ("spark.executor.instances" -> "0")) == 100)
  }

  test("NN-descent rounds do not lose recall vs the raw LSH seed graph") {
    val emb = corpus(800, 6, seed = 23L)
    val probes = emb.filter(col("vec_id") < 8)
    val brute = asPairs(Similarity.knnBruteForce(emb, probes,
      "vec_id", "embedding", "vec_id", "embedding", k = 5))
    val bits = Similarity.bandBitsFor(800, 96)
    def recall(rounds: Int): Double = {
      val idx = Similarity.nswIndex(emb, "vec_id", "embedding",
        degree = 8, fineBits = bits, refineRounds = rounds)
      val got = asPairs(Similarity.knnGraphSearch(idx, emb, probes,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, beam = 8, hops = 4, entries = 4))
      got.count(brute.contains).toDouble / brute.size
    }
    val (r0, r2) = (recall(0), recall(2))
    assert(r2 >= r0, s"NN-descent must not hurt: rounds0=$r0 rounds2=$r2")
    assert(r2 >= 0.5, s"clustered corpus should search well, got $r2")
  }
}
