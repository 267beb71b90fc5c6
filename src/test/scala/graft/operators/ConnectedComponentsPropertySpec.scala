package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property check for the pointer-jumping connected-components labeling:
  * on seeded pseudo-random graphs of several shapes — sparse random edges,
  * a long chain (high diameter, many propagation rounds), small cliques,
  * and isolated pairs — the distributed min-label fixpoint must equal a
  * driver-side union-find computed straight from the definition.
  */
class ConnectedComponentsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Union-find with min-id roots: parenting the larger root under the
    * smaller makes find() return the component's minimum id — the same
    * canonical label connectedComponents converges to. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def mod(x: Long, n: Long): Long = ((x % n) + n) % n

  /** Deterministic edge list: m pseudo-random edges over n nodes. */
  private def randomEdges(seed: Long, n: Long, m: Int): Seq[(Long, Long)] =
    (1 to m).flatMap { i =>
      val a = mod(seed * 6364136223846793005L + i * 1442695040888963407L, n)
      val b = mod((seed + i) * 2862933555777941757L + 3037000493L, n)
      if (a == b) None else Some((a, b))
    }

  for (seed <- Seq(1L, 7L, 42L)) {
    test(s"connectedComponents equals union-find (seed=$seed)") {
      val edges = randomEdges(seed, 200L, 260) ++
        (0L until 60L).map(i => (1000L + i, 1001L + i)) ++   // 61-node chain
        Seq((2000L, 2001L), (2001L, 2002L), (2000L, 2002L),  // triangle
            (3000L, 3001L))                                  // isolated pair
      val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .select(col("id"), col("component")).as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      assert(got.size == want.size,
        s"labeled ${got.size} nodes, union-find has ${want.size}")
      val diff = want.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }
      assert(diff.isEmpty, s"first mismatches (id, got, want): ${diff.take(10)}")
    }
  }
}
