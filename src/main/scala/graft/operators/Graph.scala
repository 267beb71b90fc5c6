package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph PageRank by power iteration (Brin & Page 1998) — the
  * domain/page authority signal web-curation pipelines weight quality by
  * (a crawl frontier orders by it; Common-Crawl-derived corpora ship
  * harmonic/PageRank centrality as a quality feature).
  *
  * Scale shape — the canonical Pregel iteration, declaratively: per
  * iteration ONE shuffle (the contribution sum on `dst`; the rank⋈edges
  * join co-shuffles on the same key and AQE picks broadcast when ranks
  * fit), contributions map-side combined, rank state O(nodes) — the edge
  * set is scanned, never materialized per iteration. Driver state is ONE
  * scalar (the node count); the per-iteration dangling mass is a 1-row
  * aggregate broadcast back into the same job, not a driver action.
  * Edges, degrees and each iteration's ranks are eagerly
  * localCheckpoint'ed (the [[Dedup]] pointer-jumping discipline): the
  * checkpoint is each round's single anchoring job, and without it deep
  * iteration counts would re-execute lineage from the source and stack
  * Catalyst plans.
  *
  * Engine-exactness (the q_pagerank gate replays 2 iterations in DuckDB
  * hash-exact): per-edge contributions rank/out_deg are quantized to the
  * 2^-40 grid BEFORE the dst-sum, and the dangling mass before its sum,
  * so every aggregation is association-order-free (total rank mass ≈ 1,
  * far under the 2^13 exactness bound); the update
  * `(1−d)/N + d·(S + D/N)` is a fixed IEEE op order both engines repeat.
  */
object Graph {

  private val Q = 1099511627776.0 // 2^40

  /** Rank frame `(node, rank)` after `iters` power iterations over
    * `edges(srcCol, dstCol)`. Nodes = every distinct endpoint; dangling
    * nodes (no out-edges) redistribute their mass uniformly, the
    * textbook treatment.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0 && damping > 0 && damping < 1,
      s"need iters >= 0, 0 < damping < 1 (got $iters, $damping)")
    // edges and degrees are re-read twice per iteration and ranks anchor a
    // per-iteration driver action (the dangling sum) — materialize all
    // three so each iteration reads a checkpoint instead of re-executing
    // the whole lineage from the source (the Dedup pointer-jump round
    // discipline)
    val e = edges.select(
        col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "cannot rank an empty graph")
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // mass parked on dangling nodes, redistributed uniformly — a 1-row
      // quantized-exact aggregate that rides the SAME iteration job as a
      // broadcast parameter frame (the codebase's standard 1-row
      // crossJoin device) instead of anchoring its own driver action:
      // one job per iteration, not two
      val dangling = ranks
        .join(outDeg, ranks("node") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(floor(col("rank") * lit(Q)) / lit(Q)), lit(0.0))
          .as("dmass"))
      val contrib = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst"),
          (floor(col("rank") / col("out_deg").cast("double") * lit(Q)) / lit(Q))
            .as("c"))
      val inbound = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // dmass / n in-plan is the same IEEE divide the driver used to do,
      // so every rank value (and gate hash) is unchanged
      ranks = ranks
        .join(inbound, ranks("node") === inbound("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(ranks("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("s"), lit(0.0)) + col("dmass") / lit(n.toDouble)))
            .as("rank"))
      it += 1
      // the NEXT round would re-execute this round's lineage; an O(nodes)
      // eager checkpoint is cheaper than one re-execution
      if (it < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  // ---- DuckDB replay ------------------------------------------------------

  /** CTE chain replaying [[pageRank]] over a caller-provided CTE
    * `edgesCte(src, dst)`, ending in `pr_r$iters(node, rank)` — identical
    * IEEE op order (init 1/N, 2^-40-quantized contribution and dangling
    * sums, `(1−d)/N + d·(S + D/N)` update), so ranks hash-match exactly.
    */
  def pageRankCtes(edgesCte: String, iters: Int, damping: Double): String = {
    val sb = new StringBuilder
    sb.append(
      s"""prnodes AS (SELECT DISTINCT node FROM (
         |    SELECT src AS node FROM $edgesCte
         |    UNION ALL SELECT dst FROM $edgesCte)),
         |prodeg AS (SELECT src, count(*) AS out_deg FROM $edgesCte GROUP BY 1),
         |prn AS (SELECT count(*) AS n FROM prnodes),
         |pr_r0 AS (SELECT node, CAST(1 AS double) / n AS rank
         |  FROM prnodes CROSS JOIN prn)""".stripMargin)
    for (i <- 1 to iters) {
      val p = s"pr_r${i - 1}"
      sb.append(s""",
         |dang$i AS (SELECT coalesce(sum(
         |      floor(rank * 1099511627776) / 1099511627776), CAST(0 AS double)) AS d
         |  FROM $p LEFT JOIN prodeg ON $p.node = prodeg.src
         |  WHERE prodeg.src IS NULL),
         |ctr$i AS (SELECT e.dst,
         |    floor(r.rank / CAST(o.out_deg AS double) * 1099511627776)
         |      / 1099511627776 AS c
         |  FROM $edgesCte e JOIN $p r ON e.src = r.node
         |  JOIN prodeg o ON e.src = o.src),
         |inb$i AS (SELECT dst, sum(c) AS s FROM ctr$i GROUP BY 1),
         |pr_r$i AS (SELECT n0.node,
         |    (CAST(1 AS double) - $damping) / prn.n
         |      + $damping * (coalesce(i.s, CAST(0 AS double)) + dang$i.d / prn.n)
         |      AS rank
         |  FROM $p n0 LEFT JOIN inb$i i ON n0.node = i.dst
         |  CROSS JOIN prn CROSS JOIN dang$i)""".stripMargin)
    }
    sb.toString
  }
}
