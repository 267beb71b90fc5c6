package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cell-blocked spatial neighbor join: equality with the brute-force answer
  * (completeness + exactly-once pair generation in one check) and the
  * no-cartesian plan claim.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scattered points, including exact-boundary and same-cell
  // and cross-cell neighbor cases
  private def points = {
    val rng = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rng.nextInt(1000000).toLong, rng.nextInt(1000000).toLong)) ++
      Seq((901L, 100000L, 100000L), (902L, 100000L + 50000L, 100000L), // d = radius exactly
        (903L, 199999L, 199999L), (904L, 200001L, 200001L)) // straddling a cell border
    pts.toDF("id", "lat_udeg", "lon_udeg")
  }

  test("neighborPairs equals brute force (completeness + no duplicates)") {
    val r = 50000L
    val got = Geo.neighborPairs(points, "id", cellUdeg = 50000L, radiusUdeg = r)
      .as[(Long, Long, Long)].collect().sorted
    val pts = points.as[(Long, Long, Long)].collect()
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).sorted
    assert(got.toSeq == want.toSeq,
      s"blocked join diverged from brute force: got ${got.length}, want ${want.length}")
    assert(want.exists { case (a, b, d2) => Set(a, b) == Set(901L, 902L) && d2 == r * r },
      "the exact-boundary pair must be present (<= semantics)")
    assert(want.exists { case (a, b, _) => Set(a, b) == Set(903L, 904L) },
      "the cell-border-straddling pair must be present")
  }

  test("plan has no cartesian product and joins on cell keys") {
    val df = Geo.neighborPairs(points, "id", 50000L, 50000L)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoopJoin"),
      s"spatial join must block on cells, not cross-join:\n$phys")
  }
}
