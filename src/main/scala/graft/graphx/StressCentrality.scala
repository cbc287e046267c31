package graft.graphx

import org.apache.spark.SparkContext
import org.apache.spark.graphx._

/** General-graph stress centrality with the reference's semantics
  * (`/root/reference/src/main.js:108-125`): for each countable node x,
  * the number of shortest paths p over all ORDERED endpoint pairs
  * (s, d), s ≠ d, |p| > 1, with x strictly interior.
  *
  * This is the ≥3-diameter generalization and independent cross-check of
  * [[graft.snap.GraphAnalytics.centralityClosedForm]] (which is exact for
  * ego networks, where every shortest path has length ≤ 2).
  *
  * Algorithm: one synchronized multi-source Pregel BFS computing, per
  * vertex, `source → (distance, σ)` where σ is the shortest-path count —
  * σ contributions for a (vertex, source) pair all arrive in the single
  * superstep where that distance is first reached, so each entry is
  * written exactly once (no double counting). Then
  * `stress(x) = Σ_{(s,d)} σ(s,x)·σ(x,d)` over ordered pairs with
  * `dist(s,x) + dist(x,d) = dist(s,d) > 1`, s ≠ x ≠ d.
  *
  * State is O(V) per vertex: meant for validation at test scale. The
  * production path for diameter-2 graphs is the closed form (one
  * self-join); for truly large general graphs one would run Brandes-style
  * source-batched BFS instead.
  */
object StressCentrality {

  type PathMap = Map[VertexId, (Int, Long)]

  private def mergeMaps(a: PathMap, b: PathMap): PathMap =
    (a.keySet ++ b.keySet).iterator.map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((da, sa)), Some((db, sb))) =>
          if (da < db) k -> (da, sa)
          else if (db < da) k -> (db, sb)
          else k -> (da, sa + sb)
        case (Some(v), None) => k -> v
        case (None, Some(v)) => k -> v
      }
    }.toMap

  /** Per-vertex map of every reachable source → (distance, #shortest paths).
    *
    * Explicit synchronized BFS loop (aggregateMessages + outerJoinVertices)
    * rather than `Pregel`: state is (settled entries, this round's fresh
    * entries), only fresh entries are forwarded, and every round clears the
    * frontier of non-receiving vertices. (Pregel's active-set semantics
    * would re-send a stale frontier from an inactive endpoint of a
    * half-active triplet forever.) σ contributions for a (vertex, source)
    * pair all arrive in the single round where that distance is first
    * reached, so each entry is written exactly once — no double counting. */
  def allPairs[VD: scala.reflect.ClassTag, ED: scala.reflect.ClassTag](
      graph: Graph[VD, ED]): VertexRDD[PathMap] = {
    // 2D edge partitioning bounds vertex replication at sqrt(numParts) —
    // the right default before iterative GraphX jobs at scale.
    var g: Graph[(PathMap, PathMap), ED] = graph
      .partitionBy(PartitionStrategy.EdgePartition2D)
      .mapVertices((id, _) =>
        (Map(id -> (0, 1L)): PathMap, Map(id -> (0, 1L)): PathMap)).cache()
    var active = 1L
    while (active > 0) {
      val msgs = g.aggregateMessages[PathMap](
        ctx => {
          def bump(m: PathMap): PathMap = m.map { case (k, (d, s)) => k -> (d + 1, s) }
          if (ctx.srcAttr._2.nonEmpty) ctx.sendToDst(bump(ctx.srcAttr._2))
          if (ctx.dstAttr._2.nonEmpty) ctx.sendToSrc(bump(ctx.dstAttr._2))
        },
        mergeMaps)
      val next = g.outerJoinVertices(msgs) { (_, st, msgOpt) =>
        msgOpt match {
          case Some(m) =>
            val fresh = m.filter { case (k, _) => !st._1.contains(k) }
            (st._1 ++ fresh, fresh)
          case None => (st._1, Map.empty: PathMap)
        }
      }.cache()
      active = next.vertices.filter(_._2._2.nonEmpty).count()
      g.unpersist(blocking = false)
      g = next
    }
    g.vertices.mapValues(_._1)
  }

  /** Stress centrality for every x in `countable` (the reference counts
    * friends only — the ego can be interior but is never counted or used
    * as an endpoint). `edges` are undirected (one tuple per pair). */
  def stress(sc: SparkContext, edges: Seq[(Long, Long)], countable: Set[Long]): Map[Long, Long] = {
    val graph = Graph.fromEdgeTuples(sc.parallelize(edges.map { case (a, b) => (a, b) }), ())
    val maps = allPairs(graph).collect().toMap
    val nodes = countable.toSeq
    nodes.map { x =>
      val mx = maps(x)
      val total = (for {
        s <- nodes if s != x
        d <- nodes if d != x && d != s
        (dsx, ssx) <- mx.get(s)
        (dxd, sxd) <- mx.get(d)
        (dsd, _) <- maps(s).get(d)
        if dsd > 1 && dsx + dxd == dsd
      } yield ssx * sxd).sum
      x -> total
    }.toMap
  }
}
