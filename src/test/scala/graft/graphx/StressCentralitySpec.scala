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
