package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: token → document frequency + a capped,
  * ordered postings list. The retrieval-side artifact of a text corpus —
  * candidate lookup for search, contamination probes, and the posting-list
  * representation the near-dup operators join on.
  *
  * Scale shape: the postings cap is the whole point at 100 TB — a stopword
  * token's full postings list is corpus-sized, and materializing it (e.g.
  * `collect_list` per token, or a window rank) concentrates that list in
  * one task. Here:
  *
  *  - document frequency is a map-side-combined count (exact even for
  *    capped tokens — hot tokens collapse before the shuffle);
  *  - the kept postings are the `maxPostings` SMALLEST doc ids per token,
  *    selected by [[graft.plans.TopKPerKey]]'s bounded heaps: a hot token
  *    streams through the heap in O(n) keeping k rows, it is never sorted
  *    in full. Deterministic: min-id selection is rerun-stable;
  *  - the final `collect_list` sees at most `maxPostings` rows per token,
  *    and runs in the SAME partitioning TopKPerKey required, so no extra
  *    exchange (spec-asserted).
  *
  * `truncated` = 1 marks tokens whose true postings exceed the cap.
  */
object Index {

  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val posting = df.select(
      col(idCol).as("_doc"),
      explode(array_distinct(Text.tokens(col(textCol)))).as("token"))
    val counts = posting.groupBy(col("token"))
      .agg(count(lit(1)).as("df_cnt"))
    val capped = graft.plans.TopK.perKey(
      posting, Seq("token"), Seq(col("_doc").asc), maxPostings)
    val lists = capped.groupBy(col("token"))
      .agg(sort_array(collect_list(col("_doc"))).as("_postings"))
    counts.join(lists, "token")
      .select(
        col("token"),
        col("df_cnt"),
        array_join(col("_postings"), ",").as("postings_csv"),
        when(col("df_cnt") > maxPostings, 1L).otherwise(0L).as("truncated"))
  }
}
