package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join") {
    // skewed left: 90 rows on key 1, a few elsewhere
    val left = ((1 to 90).map(i => (1L, i.toLong)) ++ Seq((2L, 91L), (3L, 92L)))
      .toDF("k", "row_id")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val salted = Skew.saltedJoin(left, right, "k", "row_id", 4)
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    val plain = left.join(right, "k")
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 91)
  }
}
