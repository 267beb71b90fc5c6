package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC op-log application — the missing DELETE next to [[Upsert]]: a
  * change log of `I`nsert / `U`pdate / `D`elete operations (Debezium /
  * Delta change-feed shape) folds into a base snapshot to produce the
  * table's current state. The op that counts per key is the LATEST by
  * the log's sequence column; a final `D` removes the key (snapshot row
  * included), a final `I`/`U` upserts the logged payload, and keys the
  * log never touches keep their snapshot rows.
  *
  * Scale shape: the log reduces to one winner row per key with a
  * map-side-combinable `max_by` aggregation (NOT a window over the raw
  * log — no per-key sort materialization, one shuffle of the log keyed
  * by `key`); the fold is then ONE full-outer merge with the snapshot
  * on the same key. Two exchanges total, both key-partitioned — at
  * 100 TB the log agg prunes to |keys touched| rows before the join,
  * so the snapshot-side shuffle dominates, as it must.
  *
  * Determinism: `seqCol` must order each key's ops totally (a log
  * offset / commit LSN — unique by construction in real feeds);
  * enforced here by tie-breaking `max_by` on the (seq, op, payload)
  * struct, so equal-seq anomalies still fold identically in any engine.
  */
object Cdc {

  /** Fold `log(key, seqCol, opCol, payload…)` into `snapshot(key,
    * payload…)`. Payload columns are everything in `log` except
    * `seqCol`/`opCol`, and must match the snapshot's non-key columns by
    * name. Ops: 'D' deletes the key; anything else upserts the payload.
    */
  def applyLog(
      snapshot: DataFrame,
      log: DataFrame,
      key: Seq[String],
      seqCol: String,
      opCol: String): DataFrame = {
    require(key.nonEmpty, "need at least one key column")
    val payload = log.columns.filterNot(c =>
      key.contains(c) || c == seqCol || c == opCol).toSeq
    require(snapshot.columns.toSet == (key ++ payload).toSet,
      s"snapshot columns ${snapshot.columns.mkString(",")} must be key + " +
        s"log payload (${(key ++ payload).mkString(",")})")
    // one winner op per touched key: max_by on the full (seq, op,
    // payload) struct — map-side combinable, deterministic on seq ties
    val winner = log
      .groupBy(key.map(col): _*)
      .agg(max(struct((seqCol +: opCol +: payload).map(col): _*))
        .as("_w"))
      .select(key.map(col) ++
        Seq(col(s"_w.$opCol").as("_op")) ++
        payload.map(c => col(s"_w.$c").as(s"_n_$c")): _*)
    snapshot
      .join(winner, key, "full_outer")
      // a key with no log winner keeps its snapshot payload; a 'D'
      // winner drops the row; any other winner takes the logged payload
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(key.map(col) ++ payload.map(c =>
        when(col("_op").isNotNull, col(s"_n_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
