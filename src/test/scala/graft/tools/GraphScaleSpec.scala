package graft.tools

import graft.SparkSuite
import graft.snap.GraphSuite
import org.apache.spark.graphx.{Graph, PartitionStrategy}

/** Construction invariants for the GraphScale derived graph (r13): the
  * at-scale GraphX evidence in GRAPH_SCALE_r13.json is only as good as
  * the derivation — pin it at 2 copies so a regression (ghost edges,
  * colliding replicas, broken cross-links) fails `sbt test`, not the
  * hour-long manual run.
  */
class GraphScaleSpec extends SparkSuite {

  test("derived pairs: replicas disjoint, cross-links stitch one component") {
    val copies = 2
    val base = graft.graphx.GraphxAnalytics
      .unionEdgeTuples(spark, GraphSuite.dataDir).cache()
    val nBase = base.count()
    val pairs = GraphScale.derivedPairs(spark, GraphSuite.dataDir, copies).cache()
    // 2 replicas + per-copy center spokes to the hub (9 per copy: ego 0's
    // center IS the hub) + the hub tree (copies - 1 edges).
    assert(pairs.count() == copies * nBase + copies * 9 + (copies - 1))
    // Replicas stay inside their id band — no collisions by construction.
    val bandViolations = pairs.filter { case (a, b) =>
      a / GraphScale.CopyOffset != b / GraphScale.CopyOffset &&
        !(a % GraphScale.CopyOffset == 100000000L - 1L &&
          b % GraphScale.CopyOffset == 100000000L - 1L)
    }.count()
    assert(bandViolations == 0L, "only hub-to-hub edges may cross copy bands")
    // No self-loops (the i=0 hub spoke is excluded).
    assert(pairs.filter(t => t._1 == t._2).count() == 0L)
    // The cross-links stitch everything into ONE component.
    val directed = pairs.flatMap(t => Iterator(t, t.swap))
    val comp = Graph.fromEdgeTuples(directed, ())
      .partitionBy(PartitionStrategy.EdgePartition2D)
      .connectedComponents().vertices.map(_._2).distinct().count()
    assert(comp == 1L, s"derived graph must be one component, got $comp")
    pairs.unpersist(blocking = false)
    base.unpersist(blocking = false)
  }

  test("chain topology: hub links form a path, diameter grows with copies") {
    val copies = 5
    val tree = GraphScale.derivedPairs(spark, GraphSuite.dataDir, copies).cache()
    val chain = GraphScale
      .derivedPairs(spark, GraphSuite.dataDir, copies, chain = true).cache()
    // Same edge budget — only the hub stitch differs.
    assert(tree.count() == chain.count())
    val hubIds = (0 until copies).map(GraphScale.hub).toSet
    val chainHubLinks = chain.filter { case (a, b) =>
      hubIds.contains(a) && hubIds.contains(b)
    }.collect().toSet // bounded-collect: copies-1 hub links
    assert(chainHubLinks ==
      (1 until copies).map(c => (GraphScale.hub(c), GraphScale.hub(c - 1))).toSet,
      "chain stitch must be the hub path c -> c-1")
    // BFS distance hub(0) -> hub(copies-1) is exactly copies-1 on the
    // chain (long diameter) vs <= 2·log2(copies) hops on the tree.
    def hubDist(pairs: org.apache.spark.rdd.RDD[(Long, Long)]): Int = {
      val adj = pairs.flatMap(t => Iterator(t, t.swap))
        .filter(t => hubIds.contains(t._1) && hubIds.contains(t._2))
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap // bounded-collect: hub-hub links only
      var frontier = Set(GraphScale.hub(0))
      var seen = frontier
      var d = 0
      while (!frontier.contains(GraphScale.hub(copies - 1))) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).diff(seen)
        seen ++= frontier
        d += 1
        assert(d <= copies, "hub graph disconnected?")
      }
      d
    }
    assert(hubDist(chain) == copies - 1)
    assert(hubDist(tree) < copies - 1)
    tree.unpersist(blocking = false)
    chain.unpersist(blocking = false)
  }

  test("the at-1M fixed-point scale satisfies the enforced magnitude bound") {
    // 250 copies ≈ 1.06M nodes; the knob GraphScale runs at must clear
    // requireFixedPointBounds (100·n·scale ≤ Long.MaxValue) with margin,
    // or the tool dies an hour in.
    assert(2000000L <= Long.MaxValue / 100L / GraphScale.ScaleAt1M)
  }
}
