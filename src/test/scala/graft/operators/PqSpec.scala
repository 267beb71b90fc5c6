package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // four planted patterns in 8 dims, five exact copies each; ids 0..3 are
  // one copy of each pattern, so smallest-id seeding starts on distinct
  // patterns and one Lloyd round converges codebooks to the patterns
  private def corpus = (0L until 20L).map { i =>
    val p = (i % 4).toInt
    (i, Array.tabulate(8)(d => if (d / 2 == p) 1.0f else 0.0f))
  }.toDF("vec_id", "embedding")

  private def books = Pq.trainCodebooks(corpus, "vec_id", "embedding",
    m = 2, k = 4, iters = 1)

  test("copies of the same pattern share codes; codes stay in the codebook") {
    val b = books
    val codes = Pq.encode(corpus, "vec_id", "embedding", b)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(codes.length == 20)
    val byPattern = codes.groupBy(_._1 % 4)
    byPattern.foreach { case (_, rows) =>
      assert(rows.map(r => (r._2, r._3)).distinct.length == 1,
        s"pattern copies must encode identically: $rows")
    }
    val allowed = b.map { case (_, model) => model.map(_._1).toSet }
    codes.foreach { case (_, c0, c1) =>
      assert(allowed(0).contains(c0) && allowed(1).contains(c1))
    }
  }

  test("ADC distance is exact on codebook-center vectors") {
    val b = books
    val probe = Array.tabulate(8)(d => if (d / 2 == 0) 1.0 else 0.0)
    val adc = Pq.adcDistances(
        Pq.encode(corpus, "vec_id", "embedding", b), "vec_id", probe, b)
      .select($"vec_id", $"adc_d2").as[(Long, Double)].collect().sortBy(_._1)
    adc.foreach { case (id, d) =>
      if (id % 4 == 0) assert(d == 0.0, s"pattern-0 copy $id should be at ADC 0, got $d")
      else assert(d > 0.0, s"other-pattern $id should be at positive ADC, got $d")
    }
  }

  test("residuals subtract each vector's own coarse centroid, scan-side") {
    val coarse = Array(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)))
    val df = Seq(
      (10L, Array(1.5f, 0.25f, 0.0f, 0.0f), 0L),
      (11L, Array(0.0f, 1.5f, 0.5f, 0.0f), 1L))
      .toDF("vec_id", "embedding", "cell")
    val res = Pq.residuals(df, "vec_id", "embedding", "cell", coarse)
      .as[(Long, Long, Seq[Double])].collect().sortBy(_._1)
    assert(res(0)._3 == Seq(0.5, 0.25, 0.0, 0.0))
    assert(res(1)._3 == Seq(0.0, 0.5, 0.5, 0.0))
    val phys = Pq.residuals(df, "vec_id", "embedding", "cell", coarse)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"residuals must not shuffle:\n$phys")
  }

  test("exact re-rank recovers the ordering ADC quantization loses") {
    // clustered corpus with deterministic per-member jitter: every member
    // of a cluster encodes to the SAME codes (jitter 0.01 vs cluster
    // separation 1.0), so ADC distances tie within the cluster and the
    // (adc_d2, id) top-k degenerates to smallest-id — re-ranking the ADC
    // top-C with exact distances must recover the true nearest set
    val clustered = (0L until 40L).map { i =>
      val p = (i % 4).toInt
      (i, Array.tabulate(8)(d =>
        (if (d / 2 == p) 1.0f else 0.0f) + ((i * 7 + d * 3) % 5 - 2) * 0.01f))
    }
    val df = clustered.toDF("vec_id", "embedding")
    val b = Pq.trainCodebooks(df, "vec_id", "embedding", m = 2, k = 4, iters = 1)
    val probe = Array.tabulate(8)(d => if (d / 2 == 0) 1.0 else 0.0)
    def exactD2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - probe(i); s += d * d; i += 1 }
      s
    }
    val truth = clustered.map { case (id, v) => (exactD2(v), id) }
      .sorted.take(5).map(_._2).toSet
    val adc = Pq.adcDistances(
      Pq.encode(df, "vec_id", "embedding", b), "vec_id", probe, b)
    val adcTop = adc.orderBy($"adc_d2", $"vec_id").limit(5)
      .select($"vec_id").as[Long].collect().toSet
    val rerank = Pq.searchRerank(adc.select($"vec_id", $"adc_d2"), df,
      "vec_id", "embedding", probe, c = 12, k = 5)
    val rerankRows = rerank.select($"vec_id", $"exact_d2")
      .as[(Long, Double)].collect()
    // rerank output is exact-distance ordered and exactly the true top-5
    assert(rerankRows.map(_._2).toSeq == rerankRows.map(_._2).sorted.toSeq)
    assert(rerankRows.map(_._1).toSet == truth,
      s"re-rank must return the exact top-5 (got ${rerankRows.toSeq}, want $truth)")
    val recallAdc = (adcTop & truth).size
    assert(recallAdc < 5,
      s"corpus must make ADC-only ordering lossy for the test to bite (got $recallAdc/5)")
    // the candidate join stays broadcast (corpus side scanned, never shuffled)
    val phys = rerank.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"re-rank candidate join must broadcast:\n$phys")
  }

  test("encoding is scan-side and partitioning-invariant") {
    val b = books
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, "vec_id", "embedding", b)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(corpus.repartition(7)) == run(corpus.coalesce(1)))
    val phys = Pq.encode(corpus, "vec_id", "embedding", b)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"encode must not shuffle:\n$phys")
  }
}
