package graft.graphx

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Stress centrality for every vertex satisfying `countable` (the
    * reference counts friends only — the ego can be interior but is never
    * counted or used as an endpoint). `edges` are undirected, ONE tuple
    * per pair (both-direction duplicates would double every σ).
    *
    * Fully distributed: the per-vertex path maps never leave the
    * executors. The σ(s,x)·σ(x,d) combination is a self-join of the
    * flattened (x, endpoint, dist, σ) entries on x, validated against the
    * endpoint-pair distance table — all shuffles keyed on vertex/pair ids,
    * nothing driver-side. Returns (id BIGINT, centrality BIGINT), one row
    * per countable vertex (zeros included). */
  def stress(spark: SparkSession, edges: RDD[(VertexId, VertexId)],
      countable: VertexId => Boolean): DataFrame = {
    import spark.implicits._
    val graph = Graph.fromEdgeTuples(edges, ())
    val maps = allPairs(graph)
    // (x, e, dist(x,e), σ(x,e)) for every reachable endpoint e ≠ x.
    // Symmetric in (x, e) for undirected graphs, so one flatten serves
    // both the interior-leg and the endpoint-pair-distance roles.
    val ent = maps.flatMap { case (x, m) =>
      m.iterator.collect { case (e, (dd, sig)) if e != x => (x, e, dd, sig) }
    }.cache()
    val legs = ent
      .filter { case (x, e, _, _) => countable(x) && countable(e) }
      .toDF("x", "e", "de", "se")
    val pairDist = ent
      .filter { case (a, b, dd, _) => dd > 1 && countable(a) && countable(b) }
      .map { case (a, b, dd, _) => (a, b, dd) }
      .toDF("s", "d", "dsd")
    val contrib = legs.select(col("x"), col("e").as("s"),
        col("de").as("dsx"), col("se").as("ssx"))
      .join(legs.select(col("x"), col("e").as("d"),
        col("de").as("dxd"), col("se").as("sxd")), "x")
      .where(col("s") =!= col("d"))
      .join(pairDist, Seq("s", "d"))
      .where(col("dsx") + col("dxd") === col("dsd"))
      .groupBy(col("x"))
      .agg(sum(col("ssx") * col("sxd")).as("centrality"))
    maps.keys.filter(countable).toDF("x")
      .join(contrib, Seq("x"), "left")
      .select(col("x").as("id"),
        coalesce(col("centrality"), lit(0L)).as("centrality"))
  }
}
