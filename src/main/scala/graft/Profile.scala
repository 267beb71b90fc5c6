package graft

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler: time labeled sub-plans of the hot queries.
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    if (args.length > 1 && args(1) == "explain") {
      // plan audit: dump formatted plans for the headline queries and grep-
      // friendly markers (PushedFilters, BroadcastHashJoin, Exchange count)
      Seq("q1_pricing", "q_multi_join_agg", "q_sessionize", "q_dim_join",
        "q_bucket15", "q_knn_brute", "q_minhash_lsh").foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
        val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("; ")
        println(s"[explain] $name exchanges=$exchanges broadcastJoins=$bhj")
        if (pushed.nonEmpty) println(s"[explain]   $pushed")
        sys.env.get("GRAFT_FULL_PLAN").foreach(_ => println(plan))
      }
      spark.stop()
      return
    }

    if (args.length > 1 && args(1) == "recall") {
      // ANN quality harness: recall@k of the LSH and IVF variants vs the
      // exact brute-force baseline on the embeddings table
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 50)
      val k = 10
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.knnBruteForce(
        emb, probes, "vec_id", "embedding", "vec_id", "embedding", k))
      Seq(
        "lsh(multiProbe=false)" -> Similarity.knnLsh(emb, probes, "vec_id", "embedding",
          "vec_id", "embedding", k, planes = 8, multiProbe = false),
        "lsh(multiProbe=true)" -> Similarity.knnLsh(emb, probes, "vec_id", "embedding",
          "vec_id", "embedding", k, planes = 8, multiProbe = true),
        "ivf(nlist=16,nprobe=4)" -> Similarity.knnIvf(emb, probes, "vec_id", "embedding",
          "vec_id", "embedding", k, nlist = 16, nprobe = 4)
      ).foreach { case (name, df) =>
        val got = pairs(df)
        val recall = (exact & got).size.toDouble / exact.size
        println(f"[recall] $name%-24s recall@$k = $recall%.3f (candidates returned: ${got.size})")
      }
      spark.stop()
      return
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    val shingled = docs.select(
      col("doc_id").as("id"), Text.wordShingles(col("text"), 3).as("sh"))
      .withColumn("set_size", size(col("sh")))
      .filter(col("set_size") > 0)
    time("shingle+size")(shingled.count())
    val posting = shingled
      .select(col("id"), col("set_size"), explode(col("sh")).as("shingle"))
    time("posting(no barrier)")(posting.count())
    val posting2 = posting.repartition(col("shingle"))
    val rare = posting2.groupBy(col("shingle")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= 1000).select("shingle")
    time("rare")(rare.count())
    val filtered = posting2.join(rare, "shingle")
    time("filtered")(filtered.count())
    val a = filtered.toDF("shingle", "id_a", "size_a")
    val b = filtered.toDF("shingle", "id_b", "size_b")
    val joined = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
    time("self-join")(joined.count())
    val pairs = joined
      .groupBy(col("id_a"), col("id_b"), col("size_a"), col("size_b"))
      .agg(count(lit(1)).as("inter"))
    time("pairs")(pairs.count())
    spark.stop()
  }
}
