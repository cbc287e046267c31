package graft.tools

import graft.Sessions
import graft.graphx.GraphxAnalytics
import org.apache.spark.graphx.TripletFields
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the r15 fixed-point PageRank ship change (r14
  * verdict item 4: attack the 337 s / 10-round g09 wall at 1M nodes).
  * The candidate is declarative, not structural: `iterateFixed`'s send
  * function reads ONLY srcAttr, so declaring TripletFields.Src lets
  * GraphX's ReplicatedVertexView ship each round's updated (deg, rank)
  * vertex state to the src-replica positions of the edge partitions
  * only, instead of both sides — halving the per-round vertex-ship
  * volume on a symmetric graph. Results are bit-identical by
  * construction (the declaration bounds what is shipped, not what is
  * computed) and asserted so below via the modular rank checksum.
  *
  * Wall adjudication per the KcoreAb discipline (CLAUDE.md r14 lesson:
  * single-box walls at 1M scale swing ~2.5-3× within a JVM with zero
  * code change): arms alternate old/new twice each in ONE session on
  * ONE dump — same JIT, same page cache, same ambient load — and any
  * claim quotes all four walls, not a cross-run delta.
  *
  * Usage: PagerankAb <graphScaleOutDir> <outJson> [iters=10]
  */
object PagerankAb {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outPath = args(1)
    val iters = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local("graft-pagerank-ab")
    val sc = spark.sparkContext

    // The dump's symmetric directed closure, re-shaped exactly as
    // GraphScale feeds pagerankFixedEdges (volume-sized partitions,
    // cached + counted outside every timed window).
    val directed = spark.read.parquet(s"$dir/edges.parquet")
      .select(col("u"), col("v")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .repartition(math.max(sc.defaultParallelism, 2)).cache()
    val nEdges = directed.count()
    System.err.println(s"[pagerank-ab] $nEdges directed edges from $dir")

    def checksumOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(expr(
        "(id % 1000000007) * (rank_fp % 1000000007) % 1000000007")))
        .head().getLong(0) % 1000000007L

    def run(fields: TripletFields): (Long, Double) = {
      val t0 = System.nanoTime()
      val out = GraphxAnalytics.pagerankFixedEdges(
        spark, directed, iters, GraphScale.ScaleAt1M, fields)
      val wall = (System.nanoTime() - t0) / 1e9
      val cks = checksumOf(out)
      out.unpersist(blocking = false)
      (cks, wall)
    }

    // Mirrored order All,Src,Src,All (ADVICE r15): a strict alternation
    // starting with All put the process-global first-draw cost (JIT,
    // page-cache fill) on the All arm's first sample every session,
    // biasing the per-arm MEDIANS (min-over-min was already robust —
    // each arm's best draw is a warm one). The palindrome gives both
    // arms one early and one late position within the session.
    val o1 = run(TripletFields.All); val n1 = run(TripletFields.Src)
    val n2 = run(TripletFields.Src); val o2 = run(TripletFields.All)
    require(Set(o1._1, n1._1, o2._1, n2._1).size == 1,
      s"All/Src ranks must be bit-identical: checksums $o1 $n1 $o2 $n2")

    def fmt(d: Double) = "%.2f".format(d)
    val json =
      s"""{"metric":"pagerank_ab","dir":"$dir","iters":$iters,""" +
        s""""edges_directed":$nEdges,"rank_checksum":${o1._1},""" +
        s""""all_walls_sec":[${fmt(o1._2)},${fmt(o2._2)}],""" +
        s""""src_walls_sec":[${fmt(n1._2)},${fmt(n2._2)}],""" +
        s""""speedup_min_over_min":${fmt(math.min(o1._2, o2._2) / math.min(n1._2, n2._2))}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_PAGERANKAB_JSON")
    println(json)
    spark.stop()
  }
}
