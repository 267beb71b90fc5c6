package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  private def exactDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Join-strategy ADVICE from two count-min counter tables (same
    * depth/width/seed, built by [[Sketch.countMinCounters]] in each side's
    * single map-side-combined pass): broadcast / shuffle / salt plus the
    * estimated output cardinality — the planner decision a petabyte join
    * needs BEFORE committing to a physical strategy, for the price of two
    * scans each side was going to do anyway.
    *
    * Derivations (all from the sketch tables, nothing re-touches data):
    *  - `n_rows_*`: Σ_b cnt[r][b] is exactly the item count for every hash
    *    row r (each item increments one cell per row) — exact, not an
    *    estimate.
    *  - `hot_*`: min_r (max_b cnt[r][b]) — an UPPER bound on the hottest
    *    key's frequency (every key's cell is ≤ the row max; collisions only
    *    add). A planted hot key pushes this up; a uniform side keeps it
    *    near n/width.
    *  - `est_pairs`: [[Sketch.countMinJoinSize]] (Cormode–Muthukrishnan
    *    inner-product estimate, always ≥ the true join size).
    *
    * Decision (integer comparisons, engine-portable): smaller side within
    * `broadcastMaxRows` → broadcast it; else a hot-key upper bound past
    * `hotKeyThreshold` → salt, with `salt_buckets = ceil(hot /
    * hotKeyThreshold)` spreading the hot key to ~threshold-sized slices;
    * else plain shuffle. Everything lands in one row — cheap enough to
    * compute per pipeline stage and log next to the plan.
    */
  def adviseJoin(
      aCounters: DataFrame,
      bCounters: DataFrame,
      broadcastMaxRows: Long,
      hotKeyThreshold: Long): DataFrame = {
    def sideStats(c: DataFrame, n: String, hot: String): DataFrame =
      c.groupBy(col("r"))
        .agg(sum(col("cnt")).as("_s"), max(col("cnt")).as("_m"))
        .agg(min(col("_s")).as(n), min(col("_m")).as(hot))
    val est = Sketch.countMinJoinSize(aCounters, bCounters)
    val joined = est
      .crossJoin(sideStats(aCounters, "n_rows_a", "hot_a"))
      .crossJoin(sideStats(bCounters, "n_rows_b", "hot_b"))
    val hot = greatest(col("hot_a"), col("hot_b"))
    val decision = when(
        least(col("n_rows_a"), col("n_rows_b")) <= broadcastMaxRows,
        lit("broadcast"))
      .when(hot > hotKeyThreshold, lit("salt"))
      .otherwise(lit("shuffle"))
    joined.select(
      col("est_pairs"), col("n_rows_a"), col("n_rows_b"),
      col("hot_a"), col("hot_b"),
      decision.as("decision"),
      when(decision === "broadcast",
        when(col("n_rows_a") <= col("n_rows_b"), lit("a")).otherwise(lit("b")))
        .otherwise(lit("none")).as("broadcast_side"),
      when(decision === "salt",
        exactDiv(hot + lit(hotKeyThreshold - 1), hotKeyThreshold))
        .otherwise(lit(1L)).as("salt_buckets"))
  }

  /** EXECUTE an equi-join under [[adviseJoin]]'s decision — the loop the
    * advisor exists to close: sketch both sides (one map-side-combined
    * pass each), collect the 1-row decision (parameters, not data), and
    * apply the recommended physical strategy:
    *
    *  - `broadcast` → the smaller side gets the broadcast hint (a hash
    *    join with no shuffle of the big side);
    *  - `salt` → [[saltedJoin]] with the advised bucket count, salting
    *    whichever side carries the hot key and replicating the other;
    *  - `shuffle` → a plain sort-merge join (the `merge` hint — at fact ×
    *    fact scale SMJ is the strategy that spills gracefully), no
    *    broadcast regardless of what the session's autoBroadcast
    *    threshold would guess from possibly-stale size stats.
    *
    * Output columns are normalized to `key, left..., right...` in every
    * branch, so the result is content-identical (rows AND schema) across
    * all three strategies — pinned by the q_join_advise_exec gate.
    *
    * `leftRowId`/`rightRowId` deterministically spread the salted side's
    * hot key ([[saltedJoin]]'s contract); they are only consulted on the
    * salt path.
    *
    * Precondition: apart from `key`, the two sides' column names must be
    * DISTINCT (enforced) — the normalized output selects by bare name,
    * and the salt path relies on distinct names to restore left/right
    * column order after swapping sides. Alias before calling if needed.
    *
    * Salt-path guard: salting replicates the non-hot side ×salt_buckets;
    * on a fact×fact join with a very hot key the advised count can cost
    * more replicated shuffle volume than the skew it spreads. The bucket
    * count is CAPPED so the replicated side's rows × buckets stays ≤
    * `maxReplicationFactor` × (n_rows_a + n_rows_b) — replication never
    * exceeds a bounded multiple of the data the join was shuffling
    * anyway. If even 2 buckets would blow the bound (the replicated side
    * is itself huge), the decision degrades to the plain sort-merge
    * shuffle (AQE's runtime skew split still applies there) — content is
    * strategy-invariant in every branch, so results are unchanged.
    */
  def executeAdvised(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftRowId: String,
      rightRowId: String,
      broadcastMaxRows: Long,
      hotKeyThreshold: Long,
      depth: Int = 4,
      width: Int = 4096,
      seed: Long = 23L,
      maxReplicationFactor: Long = 4L): DataFrame = {
    val shared = left.columns.toSet intersect right.columns.toSet
    require(shared == Set(key),
      s"executeAdvised needs distinct non-key column names; shared: " +
        shared.filterNot(_ == key).mkString(", "))
    val aC = Sketch.countMinCounters(left, Nil, col(key), depth, width, seed)
    val bC = Sketch.countMinCounters(right, Nil, col(key), depth, width, seed)
    val advice = adviseJoin(aC, bC, broadcastMaxRows, hotKeyThreshold)
      .collect().head
    val outCols = (key +: (left.columns.filterNot(_ == key) ++
      right.columns.filterNot(_ == key)).toSeq).map(col)
    advice.getAs[String]("decision") match {
      case "broadcast" =>
        val joined =
          if (advice.getAs[String]("broadcast_side") == "a")
            broadcast(left).join(right, Seq(key))
          else left.join(broadcast(right), Seq(key))
        joined.select(outCols: _*)
      case "salt" =>
        val advised = advice.getAs[Long]("salt_buckets")
        val saltLeft =
          advice.getAs[Long]("hot_a") >= advice.getAs[Long]("hot_b")
        val replRows = math.max(1L, advice.getAs[Long](
          if (saltLeft) "n_rows_b" else "n_rows_a"))
        val bound = maxReplicationFactor *
          (advice.getAs[Long]("n_rows_a") + advice.getAs[Long]("n_rows_b"))
        val buckets = math.min(advised, bound / replRows).toInt
        if (buckets < 2)
          left.join(right.hint("merge"), Seq(key)).select(outCols: _*)
        else {
          val joined =
            if (saltLeft) saltedJoin(left, right, key, leftRowId, buckets)
            else saltedJoin(right, left, key, rightRowId, buckets)
          joined.select(outCols: _*)
        }
      case _ =>
        left.join(right.hint("merge"), Seq(key)).select(outCols: _*)
    }
  }
}
