package graft.tools

import graft.Sessions
import graft.graphx.GraphxAnalytics
import org.apache.spark.graphx.{EdgeContext, Graph, PartitionStrategy, TripletFields, VertexRDD}
import org.apache.spark.sql.functions._

/** Same-JVM A/B + phase decomposition for the fixed-point PageRank
  * at-scale wall (r15 verdict item 4: attack or pin the ~156 s /
  * 10-round g09 wall at 1M nodes — the ship term is already halved via
  * TripletFields.Src, adjudicated by two r15 sessions of this tool).
  *
  * Arms, executed in the mirrored palindrome order Src,Contrib,Contrib,Src:
  *  - Src: the production `pagerankFixedEdges` barrier loop — vertex
  *    attr (deg, rank), a boxed Tuple2 in the shipped replica arrays.
  *  - Contrib: a candidate reshape with vertex attr = the CONTRIBUTION
  *    `rank div deg` — one PRIMITIVE Long, so each round's vertex ship
  *    moves an 8-byte primitive array instead of boxed tuples (degrees
  *    live in a vertex-partitioned RDD cached once and never re-shipped;
  *    the division moves from send-time to update-time). Messages, and
  *    therefore ranks, are bit-identical by construction
  *    (msg = Σ rank div deg either way) — asserted below via the modular
  *    rank checksum.
  *
  * Wall adjudication rule (stated inline, r15 verdict): single-box walls
  * at 1M scale swing ~2.5-3× within one JVM with zero code change, so
  * arms run interleaved in ONE session on ONE dump — same JIT, same page
  * cache, same ambient load — and any claim quotes all four walls plus a
  * second session's ordering, never a cross-run delta. The palindrome
  * (not strict alternation) gives BOTH arms one early and one late
  * position in the session, so the process-global first-draw cost (JIT,
  * page-cache fill) cannot land on the same arm's both samples; the
  * headline comparison is min-over-min (each arm's best draw is a warm
  * one), with all raw walls published.
  *
  * Phase decomposition (after the arms, same JVM): the production-shaped
  * barrier round is re-run with explicit per-phase actions —
  * `msgs.count()` covers [vertex ship + edge-side aggregate + message
  * shuffle-back], `vertices.count()` after the join covers the
  * vertex-side zip join — plus a static-graph aggregateMessages baseline
  * (same graph object each round: the replicated view is already
  * upgraded after the first call, so later rounds ship nothing), which
  * isolates the pure aggregate term. ship ≈ msg_phase − static_agg.
  *
  * Usage: PagerankAb <graphScaleOutDir> <outJson> [iters=10]
  */
object PagerankAb {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outPath = args(1)
    val iters = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local("graft-pagerank-ab", freezeTolerant = true)
    val sc = spark.sparkContext
    import spark.implicits._

    // The dump's symmetric directed closure, re-shaped exactly as
    // GraphScale feeds pagerankFixedEdges (volume-sized partitions,
    // cached + counted outside every timed window).
    val directed = spark.read.parquet(s"$dir/edges.parquet")
      .select(col("u"), col("v")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .repartition(math.max(sc.defaultParallelism, 2)).cache()
    val nEdges = directed.count()
    System.err.println(s"[pagerank-ab] $nEdges directed edges from $dir")

    val scale = GraphScale.ScaleAt1M
    val reset = 15L * scale / 100L

    def checksumOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(expr(
        "(id % 1000000007) * (rank_fp % 1000000007) % 1000000007")))
        .head().getLong(0) % 1000000007L

    // ---- incumbent: the production barrier loop (attr = (deg, rank)) ----
    def runSrc(): (Long, Double) = {
      val t0 = System.nanoTime()
      val out = GraphxAnalytics.pagerankFixedEdges(
        spark, directed, iters, scale, TripletFields.Src)
      val wall = (System.nanoTime() - t0) / 1e9
      val cks = checksumOf(out)
      out.unpersist(blocking = false)
      (cks, wall)
    }

    // ---- candidate: contribution attr (one primitive Long per vertex) ----
    def runContrib(): (Long, Double) = {
      val t0 = System.nanoTime()
      val g = Graph.fromEdgeTuples(directed, ())
        .partitionBy(PartitionStrategy.EdgePartition2D)
      val gd: Graph[Long, Int] = g.outerJoinVertices(g.outDegrees) {
        (_, _, d) => math.max(d.getOrElse(0).toLong, 1L)
      }
      // Degrees stay vertex-partitioned (same partitioner as every msgs
      // VertexRDD → the per-round leftJoin is a narrow zip, never shipped).
      val degs: VertexRDD[Long] = gd.vertices.cache()
      var rg: Graph[Long, Int] = gd.mapVertices((_, d) => scale / d).cache()
      val send = (ctx: EdgeContext[Long, Int, Long]) => ctx.sendToDst(ctx.srcAttr)
      var msgs = rg.aggregateMessages[Long](send, _ + _, TripletFields.Src).cache()
      msgs.count() // forces + caches rg's edge view before the first join
      var i = 0
      while (i + 1 < iters) {
        val prev = rg
        val prevMsgs = msgs
        val updated = degs.leftJoin(msgs) { (_, d, m) =>
          (reset + 85L * m.getOrElse(0L) / 100L) / d
        }
        rg = prev.outerJoinVertices(updated)((_, old, u) => u.getOrElse(old)).cache()
        msgs = rg.aggregateMessages[Long](send, _ + _, TripletFields.Src).cache()
        msgs.count() // materializes the new edge view before prev is released
        prev.unpersistVertices(blocking = false)
        prev.edges.unpersist(blocking = false)
        prevMsgs.unpersist(blocking = false)
        i += 1
      }
      // Final round reads off RANKS (not contributions) from the last msgs.
      val out = degs.leftJoin(msgs) { (_, _, m) =>
        reset + 85L * m.getOrElse(0L) / 100L
      }.map { case (vid, r) => (vid, r) }.toDF("id", "rank_fp").cache()
      out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cks = checksumOf(out)
      out.unpersist(blocking = false)
      msgs.unpersist(blocking = false)
      rg.unpersistVertices(blocking = false)
      rg.edges.unpersist(blocking = false)
      degs.unpersist(blocking = false)
      (cks, wall)
    }

    val s1 = runSrc(); val c1 = runContrib()
    val c2 = runContrib(); val s2 = runSrc()
    require(Set(s1._1, c1._1, s2._1, c2._1).size == 1,
      s"Src/Contrib ranks must be bit-identical: checksums $s1 $c1 $c2 $s2")

    // ---- phase decomposition of the production-shaped round --------------
    System.err.println("[pagerank-ab] phase decomposition")
    val msgW = scala.collection.mutable.ArrayBuffer.empty[Double]
    val joinW = scala.collection.mutable.ArrayBuffer.empty[Double]
    val g0 = Graph.fromEdgeTuples(directed, ())
      .partitionBy(PartitionStrategy.EdgePartition2D)
    var rg = g0.outerJoinVertices(g0.outDegrees) {
      (_, _, d) => (math.max(d.getOrElse(0).toLong, 1L), scale)
    }.cache()
    rg.vertices.count()
    val sendT = (ctx: EdgeContext[(Long, Long), Int, Long]) =>
      ctx.sendToDst(ctx.srcAttr._2 / ctx.srcAttr._1)
    var prevMsgs: VertexRDD[Long] = null
    // The previous round's graph keeps its EDGE cache one extra phase
    // (released only after the next msgs.count() materializes the new
    // edge view) so no phase window ever measures a lineage recompute.
    var prevForEdges: Graph[(Long, Long), Int] = null
    for (_ <- 0 until iters) {
      var t0 = System.nanoTime()
      val m = rg.aggregateMessages[Long](sendT, _ + _, TripletFields.Src).cache()
      m.count()
      msgW += (System.nanoTime() - t0) / 1e9
      if (prevForEdges != null) {
        prevForEdges.edges.unpersist(blocking = false)
        prevForEdges = null
      }
      t0 = System.nanoTime()
      val next = rg.outerJoinVertices(m) { case (_, (d, _), mm) =>
        (d, reset + 85L * mm.getOrElse(0L) / 100L)
      }.cache()
      next.vertices.count()
      joinW += (System.nanoTime() - t0) / 1e9
      rg.unpersistVertices(blocking = false)
      prevForEdges = rg
      if (prevMsgs != null) prevMsgs.unpersist(blocking = false)
      prevMsgs = m
      rg = next
    }
    // Static-graph baseline: same graph object every round — the first
    // call pays the one-time view upgrade (ship), rounds 2+ are the pure
    // edge-side aggregate + message shuffle-back.
    val staticW = (0 until 4).map { _ =>
      val t0 = System.nanoTime()
      rg.aggregateMessages[Long](sendT, _ + _, TripletFields.Src).count()
      (System.nanoTime() - t0) / 1e9
    }

    def fmt(d: Double) = "%.2f".format(d)
    def arr(xs: Seq[Double]) = xs.map(fmt).mkString("[", ",", "]")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val aggEst = med(staticW.drop(1))
    val json =
      s"""{"metric":"pagerank_ab","dir":"$dir","iters":$iters,""" +
        s""""edges_directed":$nEdges,"rank_checksum":${s1._1},""" +
        s""""src_walls_sec":[${fmt(s1._2)},${fmt(s2._2)}],""" +
        s""""contrib_walls_sec":[${fmt(c1._2)},${fmt(c2._2)}],""" +
        s""""speedup_min_over_min":${fmt(math.min(s1._2, s2._2) / math.min(c1._2, c2._2))},""" +
        s""""pagerank_phase":{"msg_walls_sec":${arr(msgW.toSeq)},""" +
        s""""join_walls_sec":${arr(joinW.toSeq)},""" +
        s""""static_agg_walls_sec":${arr(staticW)},""" +
        s""""msg_med_sec":${fmt(med(msgW.toSeq))},"join_med_sec":${fmt(med(joinW.toSeq))},""" +
        s""""agg_est_sec":${fmt(aggEst)},"ship_est_sec":${fmt(math.max(0.0, med(msgW.toSeq) - aggEst))}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_PAGERANKAB_JSON")
    println(json)
    spark.stop()
  }
}
