package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg: comma-separated query names for fast iteration (the
    // driver passes none and benches everything)
    val only = args.headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (parquet footers, codegen, JIT) so per-query numbers
    // reflect steady-state cost, then time each query with a noop write —
    // count() would let column pruning skip projection-only query bodies.
    // Warm one query per major input table: sorted execution order puts
    // q1_pricing first, and it should not absorb the lineitem cold-read
    // cost for everyone else
    Seq("q_stg_cast", "q1_pricing", "q_sessionize", "q_text_stats",
      "q_knn_brute").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // a failed query records -1 (never its elapsed time) so a regression
    // that breaks a query cannot masquerade as a speedup
    // sorted key order: Map iteration order reshuffles whenever a query is
    // added, which made round-over-round per-query deltas pure noise (cold
    // cache lands on whichever query happens to run first)
    // median of 3 full passes: single-run per-query numbers wobble ±8%+
    // at this scale (two rounds chased phantom regressions), and a medianed
    // number is what a round-over-round delta can actually be judged on
    val queryOrder = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1)
    def runPass(keys: Set[String]): Map[String, Double] =
      queryOrder.filter { case (name, _) => keys(name) }.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val elapsed =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0 }
        name -> elapsed
      }.toMap
    val allKeys = queryOrder.map(_._1).toSet
    val passes3 = (1 to 3).map(_ => runPass(allKeys))
    // the q_stream_* rows are the board's noise floor (each is Spark's
    // per-trigger machinery over ≥5-9 asserted micro-batches — the r15
    // streamfloor adjudication) and their median-of-3 has flip-flopped the
    // round-over-round geomean ±5% three rounds running with no structural
    // change underneath; batch rows are stable at 3. Two extra passes →
    // median-of-5 on exactly those keys.
    val streamKeys = allKeys.filter(_.startsWith("q_stream_"))
    val passes = passes3 ++ (1 to 2).map(_ => runPass(streamKeys))
    val results = queryOrder.map { case (name, _) =>
      val ok = passes.flatMap(_.get(name)).filter(_ >= 0).sorted
      // median of the successful runs; any failure leaves the query
      // reported only if at least two of three passes succeeded. Lower
      // middle on an even count: with 2 survivors, ok(size/2) would report
      // the MAX — a phantom regression for any query that drops one pass
      name -> (if (ok.size < 2) -1.0 else ok((ok.size - 1) / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
