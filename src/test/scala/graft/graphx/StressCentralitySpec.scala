package graft.graphx

import graft.SparkSuite
import graft.snap.{EgoGraphs, GraphAnalytics, GraphSuite}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Dual-implementation validation of centrality (SURVEY §2.3(4); the
  * reference committed no golden values): the diameter-2 closed form used
  * in production must agree with the independent GraphX Pregel
  * path-counting implementation — on real ego networks and on random
  * star+noise graphs (which have diameter ≤ 2 by construction). */
class StressCentralitySpec extends SparkSuite {

  /** Driver-side wrapper over the distributed API for toy-graph asserts. */
  private def stressMapOf(edges: Seq[(Long, Long)], countable: Set[Long]): Map[Long, Long] =
    StressCentrality.stress(spark, spark.sparkContext.parallelize(edges), countable)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def closedFormFor(edgeTuples: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edgeTuples
      .map { case (a, b) => ("t", math.min(a, b).toString, math.max(a, b).toString) }
      .distinct.toDF("ego", "src", "dst")
    GraphAnalytics.centralityClosedForm(df).collect()
      .map(r => r.getAs[String]("name").toLong -> r.getAs[Long]("centrality")).toMap
  }

  test("hand-checked 5-node graph: path through the bridge node") {
    // Star center 0 (the "ego"), friends 1-4, friend edges: 1-2, 2-3.
    // Non-adjacent friend pairs: {1,3},{1,4},{2,4},{3,4}. Friend common
    // neighbours: 2 for {1,3} only -> stress(2) = 2; others 0.
    val friendEdges = Seq((1L, 2L), (2L, 3L))
    val spokes = (1L to 4L).map(f => (0L, f))
    val pregel = stressMapOf(
      friendEdges ++ spokes, Set(1L, 2L, 3L, 4L))
    assert(pregel == Map(1L -> 0L, 2L -> 2L, 3L -> 0L, 4L -> 0L))
    assert(closedFormFor(friendEdges) == Map(1L -> 0L, 2L -> 2L, 3L -> 0L))
  }

  test("closed form == Pregel on real ego networks (3980, 698, 414)") {
    val edges = EgoGraphs.load(spark, GraphSuite.dataDir).edges.cache()
    for (ego <- Seq("3980", "698", "414")) {
      val friendEdges = edges.filter(col("ego") === ego)
        .select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val friends = friendEdges.flatMap(t => Seq(t._1, t._2)).toSet
      val egoId = -1L // synthetic center id, disjoint from SNAP node ids
      val spokes = friends.toSeq.map(f => (egoId, f))
      val pregel = stressMapOf(
        friendEdges ++ spokes, friends)
      val closed = closedFormFor(friendEdges)
      assert(pregel == closed, s"ego $ego: Pregel != closed form")
    }
  }

  test("closed form == Pregel on random diameter-2 graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(20)
      val friends = (1L to n.toLong).toSet
      val friendEdges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val spokes = friends.toSeq.map(f => (0L, f)) // universal "ego" center
      val pregel = stressMapOf(
        friendEdges ++ spokes, friends)
      val closed = closedFormFor(friendEdges)
      // Closed form only emits nodes with >=1 friend edge; others are 0.
      friends.foreach { x =>
        assert(pregel(x) == closed.getOrElse(x, 0L), s"trial $trial node $x")
      }
    }
  }

  test("batched Brandes == all-pairs join form on random diameter-≥3 graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + rnd.nextInt(15)
      val core = for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.12
      } yield (a, b)
      // A pendant 3-path guarantees diameter >= 3 (the closed form would
      // be wrong here — this exercises the general-graph path).
      val tail = Seq((1L, n + 1L), (n + 1L, n + 2L), (n + 2L, n + 3L))
      val all = (core ++ tail).distinct
      // One non-countable vertex that can still be interior: batched ψ
      // must traverse it but never count it as endpoint or scorer.
      val countable = (1L to n + 3L).toSet - 2L
      // 2 partitions: toy graphs with default parallelism would schedule
      // 32 near-empty tasks per BFS round × batches — minutes of pure
      // scheduler overhead for milliseconds of work.
      val edgeRdd = spark.sparkContext.parallelize(all, 2)
      val joinForm = StressCentrality.stress(spark, edgeRdd, countable)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batched = StressCentrality.batchedStress(spark, edgeRdd, countable,
          batchSize = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batched == joinForm, s"trial $trial (n=$n)")
    }
  }

  test("batched eager regime (>50k nodes): double-hub star matches closed form") {
    // Two hubs joined by an edge, 30 001 spokes each: 60 004 vertices
    // forces the Pregel-ordered materialize-then-release backward sweep
    // (nVerts > LazyChainMaxNodes). Countable = 20 spokes per side + both
    // hubs (one 42-source batch). Every shortest path is unique, so
    // stress has a closed form: each hub is interior to its own side's
    // ordered spoke pairs (20·19), its side's spoke↔far-hub pairs (2·20),
    // and every cross-side ordered pair (2·20·20) = 1220; spokes are
    // degree-1, never interior.
    val nSpokes = 30001L
    val h1 = 0L; val h2 = 1L
    val aSpokes = (1L to nSpokes).map(i => 1L + 2L * i) // odd ids ≥ 3
    val bSpokes = (1L to nSpokes).map(i => 2L * i)      // even ids ≥ 2
    val edges = aSpokes.map(a => (h1, a)) ++ bSpokes.map(b => (h2, b)) :+ ((h1, h2))
    val countable: Set[Long] =
      (aSpokes.take(20) ++ bSpokes.take(20) ++ Seq(h1, h2)).toSet
    val edgeRdd = spark.sparkContext.parallelize(edges, 4)
    val got = StressCentrality.batchedStress(spark, edgeRdd, countable, batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = countable.map {
      case v if v == h1 || v == h2 => v -> 1220L
      case v => v -> 0L
    }.toMap
    assert(got == expected)
  }

  test("clustering properties: cc in [0,1]; clique => cc = 1") {
    import spark.implicits._
    // 4-clique among friends of one ego: every neighbourhood closed.
    val clique = (for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield ("k", a.toString, b.toString)).toDF("ego", "src", "dst")
    val cc = GraphAnalytics.clustering(clique).collect()
    assert(cc.forall(r => r.getAs[Double]("cc") == 1.0))

    val real = GraphAnalytics.clustering(
      EgoGraphs.load(spark, GraphSuite.dataDir).edges)
    assert(real.filter(col("cc") < 0 || col("cc") > 1.0000000001).count() == 0)
  }
}
