package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("SimHashAgg equals the 64-column declarative bit-sum formulation") {
    val hashed = Seq(
      (1L, "a b c"), (1L, "b c d"), (1L, "c d e"),
      (2L, "x y z"), (2L, "y z w"),
      (3L, "a b c") // same single shingle as part of group 1
    ).toDF("id", "shingle").select($"id", xxhash64($"shingle").as("h"))

    val native = hashed.groupBy($"id")
      .agg(SimHashAgg.simhashAgg($"h").as("simhash"))
      .as[(Long, Long)].collect().toMap

    val bitAggs = (0 until 64).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_b$i"))
    val declCol = (0 until 64)
      .map(i => when(col(s"_b$i") >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val decl = hashed.groupBy($"id").agg(bitAggs.head, bitAggs.tail: _*)
      .select($"id", declCol.as("simhash"))
      .as[(Long, Long)].collect().toMap

    assert(native == decl)
    assert(native.keySet == Set(1L, 2L, 3L))
  }
}
