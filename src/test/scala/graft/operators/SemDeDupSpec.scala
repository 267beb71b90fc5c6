package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  // ids 0,1 seed two well-separated cells; 10/11/12 are scaled copies of a
  // direction near seed 0 (cosine 1.0 to each other), 20 is a singleton
  // near seed 1
  private def vecs = Seq(
    0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
    1L -> Array(0.0f, 10.0f, 0.0f, 0.0f),
    10L -> Array(2.0f, 0.1f, 0.0f, 0.0f),
    11L -> Array(4.0f, 0.2f, 0.0f, 0.0f),
    12L -> Array(6.0f, 0.3f, 0.0f, 0.0f),
    20L -> Array(0.1f, 8.0f, 0.0f, 0.0f)
  ).toDF("vec_id", "embedding")

  test("scaled copies collapse to one component; the farthest-from-centroid copy survives") {
    val out = SemDeDup.semDedup(vecs, "vec_id", "embedding", k = 2, iters = 2, tau = 0.95)
      .select("vec_id", "component", "is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // the three scaled copies + seed 0 share a direction (cosine 1 > 0.95)
    val dupComponent = byId(10L)._2
    assert(Seq(0L, 11L, 12L).forall(byId(_)._2 == dupComponent))
    assert(out.filter(_._2 == dupComponent).count(_._3) == 1,
      "exactly one survivor per duplicate component")
    // 1 and 20 share a direction too (cosine ≈ 0.9997 > 0.95): one survivor
    assert(byId(1L)._2 == byId(20L)._2 && byId(1L)._2 != dupComponent)
    // every vector got exactly one decision row
    assert(out.length == 6 && out.map(_._1).toSet.size == 6)
    assert(out.count(_._3) == 2, "one survivor per component, two components")
  }

  test("the pair join is an equi-join on cell, never a cartesian") {
    val df = SemDeDup.semDedup(vecs, "vec_id", "embedding", k = 2, iters = 1, tau = 0.9)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      s"in-cell pairing must not plan a cartesian:\n$phys")
  }

  test("incremental mode reads the corpus from the STORED index, never re-assigns it") {
    val corpus = vecs.filter($"vec_id" =!= 10L)
    val batch = vecs.filter($"vec_id" === 10L)
    val model = KMeans.twoLevelModel(corpus, "vec_id", "embedding", k = 2, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_idx").toString
    SemDeDup.semDedupIndex(corpus, "vec_id", "embedding", model)
      .write.mode("overwrite").parquet(dir)
    val out = SemDeDup.semDedupAgainst(
      batch, spark.read.parquet(dir), "vec_id", "embedding", model, tau = 0.95)
    val phys = out.queryExecution.executedPlan.toString
    // at most ONE two-level assignment in the plan — the batch's coarse +
    // grouped-sub argmin pair (a local batch may constant-fold them away
    // entirely). The corpus side must come from the parquet index scan
    // untouched: a corpus re-assignment would add a second pair.
    assert("nearest_centroid_in|NearestCentroidIn".r.findAllIn(phys).size <= 1,
      s"corpus must not be re-assigned (sub level):\n$phys")
    assert("nearest_centroid(?!_in)|NearestCentroid(?!In)".r.findAllIn(phys).size <= 1,
      s"corpus must not be re-assigned (coarse level):\n$phys")
    assert(phys.contains("semdedup_idx"), "corpus side must scan the stored index")
    // content identity vs a from-scratch comparison of the same split
    val direct = SemDeDup.semDedupAgainst(
      batch, SemDeDup.semDedupIndex(corpus, "vec_id", "embedding", model),
      "vec_id", "embedding", model, tau = 0.95)
      .as[(Long, Long, Double)].collect().sorted
    assert(out.as[(Long, Long, Double)].collect().sorted.toSeq == direct.toSeq)
    // 10 is a scaled copy of 0/11/12's direction: all three corpus members
    // of its cell cross tau
    val hits = direct.map(_._2).toSet
    assert(Seq(0L, 11L, 12L).forall(hits.contains), s"got $hits")
  }
}
