package graft.graphx

import graft.snap.EgoGraphs
import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX library analytics (SURVEY §2.2 row 45 — the stretch beyond the
  * reference's own surface): connected components of the FRIEND-only
  * graphs (without the ego center every network is no longer trivially
  * connected) and PageRank over G⁺.
  *
  * All ten ego networks run as ONE GraphX job: vertex ids are composited
  * as `egoIndex * OFFSET + snapNodeId` (SNAP ids are small numerics and
  * the ego never appears in `.edges`), so per-ego graphs stay disjoint in
  * a single union graph.
  */
object GraphxAnalytics {

  private val Offset = 100000000L
  val egoOrder: Seq[String] =
    Seq("0", "107", "1684", "1912", "3437", "348", "3980", "414", "686", "698")

  private def friendGraph(s: SparkSession, dataDir: String,
      egos: Seq[String], withEgoCenter: Boolean): Graph[Unit, Int] = {
    val idx = egos.zipWithIndex.toMap
    val edges = EgoGraphs.load(s, dataDir).edges
      .filter(col("ego").isin(egos: _*))
      .select(col("ego"), col("src").cast("long"), col("dst").cast("long"))
      .collect() // small SNAP fixtures; at scale this stays an RDD map
      .map(r => (idx(r.getString(0)), r.getLong(1), r.getLong(2)))
    val spokes =
      if (!withEgoCenter) Array.empty[(Int, Long, Long)]
      else edges.flatMap { case (i, a, b) => Seq((i, -1L, a), (i, -1L, b)) }.distinct
    // Ego center gets the in-network id OFFSET-1 (never a SNAP node id).
    // Undirected semantics: emit both directions (PageRank follows edge
    // direction; CC would not care, but symmetry is harmless there).
    val tuples = (edges ++ spokes).flatMap { case (i, a, b) =>
      def vid(n: Long) = i * Offset + (if (n == -1L) Offset - 1 else n)
      Seq((vid(a), vid(b)), (vid(b), vid(a)))
    }
    Graph.fromEdgeTuples(s.sparkContext.parallelize(tuples.toSeq), ())
      .partitionBy(PartitionStrategy.EdgePartition2D)
  }

  /** (ego, n_components, largest) of the friend-only graph. */
  def componentStats(s: SparkSession, dataDir: String, egos: Seq[String]): DataFrame = {
    import s.implicits._
    val cc = friendGraph(s, dataDir, egos, withEgoCenter = false)
      .connectedComponents().vertices
      .map { case (vid, lbl) => ((vid / Offset).toInt, lbl) }
    cc.toDF("egoIdx", "lbl")
      .groupBy("egoIdx", "lbl").agg(count(lit(1)).as("sz"))
      .groupBy("egoIdx")
      .agg(count(lit(1)).as("n_components"), max("sz").as("largest"))
      .select(element_at(typedLit(egos), col("egoIdx") + 1).as("ego"),
        col("n_components"), col("largest"))
      .orderBy("ego")
  }

  /** (ego, name, rank) — static PageRank over G⁺ (ego spokes included). */
  def pageranks(s: SparkSession, dataDir: String, egos: Seq[String],
      iters: Int = 10): DataFrame = {
    import s.implicits._
    val pr = friendGraph(s, dataDir, egos, withEgoCenter = true)
      .staticPageRank(iters).vertices
      .map { case (vid, rank) =>
        val i = (vid / Offset).toInt
        val n = vid % Offset
        (i, if (n == Offset - 1) "ego" else n.toString, rank)
      }
    pr.toDF("egoIdx", "name", "rank")
      .select(element_at(typedLit(egos), col("egoIdx") + 1).as("ego"),
        col("name"), round(col("rank"), 6).as("rank"))
      .orderBy("ego", "name")
  }
}
