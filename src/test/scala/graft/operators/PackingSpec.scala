package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks cuts the concatenated stream every budget tokens, docs stay whole") {
    // one shard, tokens 4,4,4,5,9,3 → offsets 0,4,8,12,17,26 → with budget
    // 10 the chunks are {1,2,3} (12 tokens — overflow by one doc is the
    // layout's contract), {4,5} (14), {6} (3)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 9L), (6L, 3L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packChunks(docs, "doc_id", "n_tokens", 10L, lit(0L))
      .select($"doc_id", $"chunk_seq", $"chunk_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(packed == Seq(
      (1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 8L),
      (4L, 1L, 12L), (5L, 1L, 17L), (6L, 2L, 26L)))
  }

  test("packing is independent per shard and deterministic") {
    val docs = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 6L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packChunks(docs, "doc_id", "n_tokens", 10L,
        pmod(col("doc_id"), lit(2L)))
      .select($"doc_id", $"shard", $"chunk_seq")
      .as[(Long, Long, Long)].collect().toSet
    // shard 1: docs 1,3 (offsets 0,6 → chunks 0,0); shard 0: docs 2,4 (same)
    assert(packed == Set((1L, 1L, 0L), (3L, 1L, 0L), (2L, 0L, 0L), (4L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Packing.packChunks(docs, "doc_id", "n_tokens", 0L, lit(0L))
    }
  }

  test("chunkSliding covers every token once per stride with overlap") {
    // 10 tokens, window 8, stride 4 → starts 0, 4 (start 8's chunk would end
    // at the same token as start 4's, so it is subsumed and dropped)
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Packing.chunkSliding(docs, "doc_id", "text", 8, 4)
      .select($"chunk_idx", $"start_tok", $"n_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(chunks == Seq(
      (0L, 0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 4L, 6L, (5 to 10).map(i => s"t$i").mkString(" "))))
    // consecutive chunks overlap by window - stride tokens
    assert(chunks(0)._4.split(" ").drop(4).toSeq ==
      chunks(1)._4.split(" ").take(4).toSeq)
  }

  test("chunkSliding edge docs: empty → no chunks, short → one whole chunk") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b c")).toDF("doc_id", "text")
    val chunks = Packing.chunkSliding(docs, "doc_id", "text", 8, 4)
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect().toSeq
    assert(chunks == Seq((3L, "a b c")))
  }

  test("chunkSliding plans with no Exchange (pure scan-side generator)") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Packing.chunkSliding(docs, "doc_id", "text", 4, 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
