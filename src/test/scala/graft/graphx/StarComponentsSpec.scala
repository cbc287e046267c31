package graft.graphx

import graft.SparkSuite
import org.apache.spark.graphx.Graph

/** Star-contraction CC must agree bit-exactly with GraphX
  * connectedComponents (both converge to component-min labels) — the
  * two implementations cross-oracle each other, the g07/g10 discipline
  * applied to CC. Topologies chosen for the failure modes: random
  * multi-component (hook-order bugs), a long chain (the diameter case
  * star contraction exists for), a star (already-converged input), and
  * duplicate/reversed pairs (orientation/dedup bugs). */
class StarComponentsSpec extends SparkSuite {

  private def gxLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val rdd = spark.sparkContext.parallelize(pairs, 2)
      .flatMap(t => Iterator(t, t.swap))
    Graph.fromEdgeTuples(rdd, ()).connectedComponents()
      .vertices.collect().toMap // bounded-collect: test-sized graphs
  }

  private def starLabels(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val df = pairs.toDF("u", "v")
    val (labels, rounds) = StarComponents.runWithRounds(spark, df)
    (labels.as[(Long, Long)].collect().toMap, rounds) // bounded-collect: test-sized graphs
  }

  test("random multi-component graph: labels match GraphX exactly") {
    val rnd = new scala.util.Random(42)
    // ~3 components by id band, random edges within each band.
    val pairs = (0 until 3).flatMap { band =>
      val base = band * 1000L
      (0 until 400).map { _ =>
        (base + rnd.nextInt(300), base + rnd.nextInt(300))
      }.filter(t => t._1 != t._2)
    }
    val (star, rounds) = starLabels(pairs)
    assert(star == gxLabels(pairs))
    assert(rounds <= 8, s"random graph should converge in few rounds, took $rounds")
  }

  test("long chain (diameter = n-1): log-ish rounds, labels still exact") {
    val n = 2048L
    val pairs = (0L until n - 1).map(i => (i, i + 1))
    val (star, rounds) = starLabels(pairs)
    // Closed-form oracle, NOT gxLabels: GraphX label propagation on a
    // 2048-path needs ~2047 Pregel rounds — the exact pathology this
    // operator exists to avoid (running it here hung the suite for
    // minutes). On a path every label is the global min, analytically.
    assert(star == (0L until n).map(i => i -> 0L).toMap)
    // The entire point: label propagation needs ~n rounds here; star
    // contraction must stay logarithmic (generous 4x log2 margin).
    assert(rounds <= 4 * 11, s"chain of $n took $rounds rounds — diameter-bound?")
  }

  test("already-star input and duplicate/reversed pairs") {
    val star = (1L to 50L).map(i => (0L, i))
    val withDups = star ++ star.map(_.swap) ++ star.take(10)
    val (labels, rounds) = starLabels(withDups)
    assert(labels == (0L to 50L).map(i => i -> 0L).toMap)
    assert(rounds <= 2)
  }

  test("two isolated edges and a triangle: component minima as labels") {
    val pairs = Seq((10L, 11L), (20L, 21L), (5L, 6L), (6L, 7L), (7L, 5L))
    val (labels, _) = starLabels(pairs)
    assert(labels == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      5L -> 5L, 6L -> 5L, 7L -> 5L))
  }
}
