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

  test("packChunksBy lays docs out in the explicit order, not id order") {
    // order by (score DESC, doc_id): 3(9),1(4),4(5),2(4) → offsets 0,9,13,18
    // → budget 10 cuts chunks {3,1}, {4,2}
    val docs = Seq((1L, 4L, 5.0), (2L, 4L, 1.0), (3L, 9L, 9.0), (4L, 5L, 5.0))
      .toDF("doc_id", "n_tokens", "score")
    val packed = Packing.packChunksBy(docs, "n_tokens", 10L, lit(0L),
        Seq(col("score").desc, col("doc_id")))
      .select($"doc_id", $"chunk_seq", $"chunk_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(packed == Seq(
      (1L, 0L, 9L), (2L, 1L, 18L), (3L, 0L, 0L), (4L, 1L, 13L)))
    intercept[IllegalArgumentException] {
      Packing.packChunksBy(docs, "n_tokens", 10L, lit(0L), Seq.empty)
    }
  }

  test("packChunksBy ordered by the id alone IS packChunks") {
    val docs = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 6L), (5L, 2L))
      .toDF("doc_id", "n_tokens")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"shard", $"chunk_seq", $"chunk_offset")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(
      rows(Packing.packChunksBy(docs, "n_tokens", 10L,
        pmod(col("doc_id"), lit(2L)), Seq(col("doc_id")))) ==
      rows(Packing.packChunks(docs, "doc_id", "n_tokens", 10L,
        pmod(col("doc_id"), lit(2L)))))
  }

  test("ICP layout: same-chunk documents are more similar than the corpus average") {
    // the q_context_order composition on a clustered corpus: two-level
    // cells + proximity order + per-cell packing must put mutually-similar
    // docs in the same context window (the arXiv:2310.10638 property)
    val rnd = new scala.util.Random(31L)
    val centers = Array.fill(4, 64)(rnd.nextGaussian() * 5.0)
    val emb = (0 until 240).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val model = KMeans.twoLevelModel(emb, "vec_id", "embedding", k = 4, iters = 2)
    val assigned = KMeans.assignTwoLevel(emb, "vec_id", "embedding", model)
      .withColumn("n_tokens", lit(7L))
    val packed = Packing.packChunksBy(assigned, "n_tokens", 21L,
      col("cell"), Seq(col("dist2"), col("vec_id")))
    def meanCos(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs.agg(avg(graft.functions.Vectors.cosine(col("_va"), col("_vb"))))
        .head().getDouble(0)
    val v = emb.select(col("vec_id"), col("embedding"))
    val withVec = packed
      .select(col("cell"), col("chunk_seq"), col("vec_id"), col("embedding"))
    val inChunk = withVec.toDF("cell", "chunk_seq", "ida", "_va")
      .join(withVec.toDF("cell", "chunk_seq", "idb", "_vb"), Seq("cell", "chunk_seq"))
      .filter(col("ida") < col("idb"))
    val anyPair = v.toDF("ida", "_va").join(v.toDF("idb", "_vb"))
      .filter(col("ida") < col("idb"))
    assert(meanCos(inChunk) > meanCos(anyPair) + 0.3,
      "same-context docs must be far more similar than random pairs")
  }

  test("packBinsNoSplit: exact NFD greedy per shard, docs atomic, oversize isolated") {
    // one shard: lens sorted desc = 9,7,5,4,4,3 with budget 10 →
    // NFD bins: [9], [7], [5,4], [4,3]
    val docs = Seq((1L, 4L), (2L, 9L), (3L, 5L), (4L, 7L), (5L, 4L), (6L, 3L))
      .toDF("doc_id", "len")
    val out = Packing.packBinsNoSplit(docs, "doc_id", "len",
        budget = 10L, shardCol = lit(0L))
      .orderBy($"bin", $"pos")
      .select($"doc_id", $"bin", $"pos", $"fill_after")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 0L, 1L, 9L), (4L, 1L, 1L, 7L),
      (3L, 2L, 1L, 5L), (1L, 2L, 2L, 9L), (5L, 3L, 1L, 4L), (6L, 3L, 2L, 7L)))
    // an over-budget doc sits alone in its own bin; packing continues after
    val out2 = Packing.packBinsNoSplit(
        Seq((1L, 25L), (2L, 6L), (3L, 4L)).toDF("doc_id", "len"),
        "doc_id", "len", budget = 10L, shardCol = lit(0L))
      .orderBy($"bin", $"pos")
      .select($"doc_id", $"bin", $"pos").as[(Long, Long, Long)].collect().toSeq
    assert(out2 == Seq((1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 2L)))
  }

  test("packBinsNoSplit id gate: scale-0 decimals pack like longs; " +
      "fractional and float ids are rejected") {
    val docs = Seq((1L, 4L), (2L, 9L), (3L, 5L)).toDF("doc_id", "len")
    val asLong = Packing.packBinsNoSplit(docs, "doc_id", "len",
        budget = 10L, shardCol = lit(0L))
      .select($"doc_id", $"bin", $"pos").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    // a Decimal(20,0) surrogate key (the warehouse BIGINT flavor) casts to
    // long exactly — same packing, row for row
    val asDec = Packing.packBinsNoSplit(
        docs.withColumn("doc_id", $"doc_id".cast("decimal(20,0)")),
        "doc_id", "len", budget = 10L, shardCol = lit(0L))
      .select($"doc_id".cast("long"), $"bin", $"pos").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(asDec == asLong)
    // fractional decimals and floats truncate on cast (can collide ids) —
    // rejected up front by design
    for (t <- Seq("decimal(20,2)", "double", "string")) {
      val e = intercept[IllegalArgumentException] {
        Packing.packBinsNoSplit(docs.withColumn("doc_id", $"doc_id".cast(t)),
          "doc_id", "len", budget = 10L, shardCol = lit(0L))
      }
      assert(e.getMessage.contains("integral id column"), s"type $t")
    }
  }

  test("packBinsNoSplit: every doc placed once, fills respect the budget, " +
      "matches a reference fold on every shard, partitioning-invariant") {
    val rnd = new scala.util.Random(31)
    val docs = (0L until 700L).map(i => (i, 1L + rnd.nextInt(900).toLong))
    val df = docs.toDF("doc_id", "len")
    val shard = pmod(xxhash64($"doc_id"), lit(5L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packBinsNoSplit(d, "doc_id", "len", budget = 2048L, shardCol = shard)
        .select($"shard", $"doc_id", $"len", $"bin", $"pos", $"fill_after")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val got = run(df)
    assert(got.map(_._2).distinct.size == 700, "every doc placed exactly once")
    assert(got.forall(_._6 <= 2048L), "no bin exceeds the budget (no oversize docs here)")
    assert(got == run(df.repartition(13)), "partitioning must not change the packing")
    // reference NFD fold per shard
    for ((sh, rows) <- got.groupBy(_._1)) {
      val sorted = rows.map(r => (r._3, r._2)).sortBy { case (l, id) => (-l, id) }
      var bin = -1L; var fill = 2049L
      val ref = sorted.map { case (l, id) =>
        if (fill + l > 2048L) { bin += 1; fill = l } else fill += l
        id -> ((bin, fill))
      }.toMap
      rows.foreach { r =>
        val (id, b, fa) = (r._2, r._4, r._6)
        assert(ref(id) == (b, fa), s"shard $sh doc $id: got ($b,$fa), ref ${ref(id)}")
      }
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
