package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting. AQE's skew-join handles sort-merge
  * skew at runtime, but when one hot key dominates (the classic 100 TB
  * failure mode) explicit salting spreads that key over `saltBuckets`
  * reducers deterministically.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, with the left side salted by a
    * deterministic hash of `leftRowId` and the right side replicated
    * `saltBuckets` times. Result equals the unsalted inner join; the shuffle
    * for any single key value is spread over `saltBuckets` partitions.
    * Right side should be the smaller input (it is replicated ×saltBuckets).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftRowId: String,
      saltBuckets: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(col(leftRowId)), lit(saltBuckets.toLong)))
    val r = right.withColumn("_salt", explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
