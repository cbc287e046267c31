package graft.graphx

import graft.{QuerySpec, Tables}
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted single-source shortest paths over a graph DERIVED from the
  * relational fixture (SURVEY §2.2 rows 43-45 stretch): the part↔supplier
  * bipartite graph from lineitem, with a deterministic integer weight per
  * (part, supplier) pair. Complements the unweighted surface (g07 BFS
  * σ-counting, q97 recursive-CTE reachability) with the Bellman-Ford
  * relaxation family — "how far is every part/supplier from supplier 1
  * through shared order lines".
  *
  * Scale posture: the edge list is a distributed `distinct` over two
  * lineitem columns (no driver collect), partitions are right-sized to
  * edge volume before anything iterates (the GraphxAnalytics lesson:
  * per-round task scheduling dominates toy graphs on a full grid), and
  * per-vertex state is ONE long. Hop-bounding to `MaxHops` rounds makes
  * the semantics exactly expressible as a recursive-CTE oracle: after k
  * Pregel rounds every distance equals the minimum over ≤k-edge walks —
  * the same set the CTE enumerates with its (node, dist, hop) frontier.
  */
object WeightedPaths {

  private val PartOffset = 1000000L
  private val SourceId = 1L // supplier 1
  private val MaxHops = 4
  private val Inf = Long.MaxValue / 4 // headroom so relax-add never overflows

  def ssspWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables(s, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("sk"))
      .distinct()
    // Cache the edge RDD before the partition-sizing count so the
    // lineitem scan + distinct runs ONCE, not once for the count and
    // again when Pregel materializes the graph (DedupSuite's
    // partition-sizing pattern).
    val tuples = pairs.rdd.flatMap { r =>
      val (p, sk) = (r.getLong(0), r.getLong(1))
      val w = (p + sk) % 7 + 1
      Iterator(Edge(sk, p + PartOffset, w), Edge(p + PartOffset, sk, w))
    }.cache()
    val parts = math.max(2,
      math.min(tuples.getNumPartitions, (tuples.count() / 50000L).toInt + 1))
    val g = Graph.fromEdges(tuples.coalesce(parts), Inf)
      .mapVertices((id, _) => if (id == SourceId) 0L else Inf)
    val res = g.pregel(Inf, maxIterations = MaxHops)(
      (_, dist, msg) => math.min(dist, msg),
      t => if (t.srcAttr + t.attr < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + t.attr)) else Iterator.empty,
      math.min)
    // Materialize the answer BEFORE unpersisting: Pregel's result graph
    // is what res.vertices reads, and downstream actions (the Verify
    // dump) must not silently re-run four Bellman-Ford rounds. Eager
    // checkpoint, not cache(): Bench and Verify share one session
    // across all queries, and a permanent cache per invocation pins the
    // result for the session lifetime — checkpointed RDDs are GC-managed.
    // Durability follows the session's checkpoint config
    // (graft.Checkpointing): local blocks by default, reliable
    // checkpoint when a cluster-visible dir is set.
    val out = graft.Checkpointing.stable(
      res.vertices.filter(_._2 < Inf).toDF("node", "dist").orderBy("node"))
    res.unpersist(blocking = false)
    tuples.unpersist(blocking = false)
    out
  }

  val specs: Seq[QuerySpec] = Seq(
    // Oracle: bounded-hop weighted shortest path as a recursive CTE — the
    // frontier is (node, dist, hop) TRIPLES deduped by UNION, so state is
    // nodes × distinct dists × hops, never per-path; min(dist) collapses
    // at the end. Matches the Pregel side exactly because both compute
    // min-over-≤4-edge-walks with identical integer weights.
    QuerySpec("q114_sssp_weighted",
      (s, d) => ssspWeighted(s, d),
      Some("WITH RECURSIVE ed AS (" +
        "SELECT DISTINCT l_suppkey AS src, l_partkey + 1000000 AS dst, " +
        "(l_partkey + l_suppkey) % 7 + 1 AS w FROM lineitem " +
        "UNION ALL " +
        "SELECT DISTINCT l_partkey + 1000000, l_suppkey, " +
        "(l_partkey + l_suppkey) % 7 + 1 FROM lineitem), " +
        "walk(node, dist, hop) AS (" +
        "SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist, 0 AS hop " +
        "UNION " +
        "SELECT ed.dst, walk.dist + ed.w, walk.hop + 1 " +
        "FROM walk JOIN ed ON ed.src = walk.node WHERE walk.hop < 4) " +
        "SELECT node, min(dist) AS dist FROM walk GROUP BY node ORDER BY node")))
}
