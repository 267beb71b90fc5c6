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
}
