package graft.tools

import graft.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the r14 k-core peel change. Cross-RUN walls on this
  * host swing ~2× with page-cache/heap state (r13's same-code k-core
  * measured 239 s and 534 s in two runs), so "534 s r13 → 208 s r14" is
  * not by itself a clean claim. This harness times the OLD peel form
  * (semi-join the node-count-sized keep set — the r13 shape, inlined
  * here verbatim) and the NEW one (graft.snap.GraphAnalytics.kcore:
  * broadcast anti-join of the cached dead set) back to back, twice
  * each, alternating, in ONE session on ONE dump — same JIT, same page
  * cache, same ambient load — and asserts both produce the identical
  * node set.
  *
  * Usage: KcoreAb <graphScaleOutDir> <outJson>
  */
object KcoreAb {

  /** The r13 peel, verbatim shape: degree agg + two LEFT SEMI joins
    * against the keep set per round, count-based early exit AFTER the
    * no-op round. Kept here (not in GraphAnalytics) so the engine has
    * exactly one production implementation. */
  private def kcoreOld(edges: DataFrame, k: Int, rounds: Int, parts: Int): DataFrame = {
    var adj = graft.snap.GraphAnalytics.adjacency(edges)
      .select(col("ego"), col("v").cast("long").as("v"), col("u").cast("long").as("u"))
      .coalesce(parts).localCheckpoint()
    var prev = -1L
    var cur = adj.count()
    var r = 0
    while (r < rounds && cur != prev) {
      val keep = adj.groupBy("ego", "v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("ego", "v")
      adj = adj
        .join(keep, Seq("ego", "v"), "left_semi")
        .join(keep.withColumnRenamed("v", "u"), Seq("ego", "u"), "left_semi")
        .localCheckpoint()
      prev = cur
      cur = adj.count()
      r += 1
    }
    adj.select(col("ego"), col("v").as("node")).distinct().orderBy("ego", "node")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outPath = args(1)
    val planOnly = args.length > 2 && args(2) == "plan"
    val spark = Sessions.local("graft-kcore-ab", freezeTolerant = true)
    val sc = spark.sparkContext
    val parts = math.max(sc.defaultParallelism, 2)

    def pairsDf(): DataFrame = spark.read.parquet(s"$dir/edges.parquet")
      .where(col("u") < col("v"))
      .select(col("u").as("src"), col("v").as("dst")).withColumn("ego", lit("g"))

    // Warm the parquet footers/page cache outside every timed window.
    pairsDf().count()

    if (planOnly) {
      // Diagnose the FIRST peel round's join strategy at this scale (the
      // round with the largest dead set — if broadcast is going to fall
      // back to a shuffle anywhere, it is here).
      val adj = graft.snap.GraphAnalytics.adjacency(pairsDf())
        .select(col("ego"), col("v").cast("long").as("v"), col("u").cast("long").as("u"))
        .coalesce(parts).localCheckpoint()
      val (dead, nDead, next) = graft.snap.GraphAnalytics.peelRound(adj, 10)
      // Execute through the Dataset's OWN QueryExecution (toRdd) so the
      // AdaptiveSparkPlan is finalized in place — a write/count action
      // would plan a separate execution and leave this one initial.
      val qeNew = next.queryExecution
      qeNew.toRdd.count()
      val p = qeNew.executedPlan.toString
      System.err.println("---- new form round 1 (final) ----")
      System.err.println(p.linesIterator.take(40).mkString("\n"))
      // And the OLD form's round 1, AQE-final: did the runtime already
      // broadcast the keep semi-joins, or did it pay the SMJ shuffles?
      val keep = adj.groupBy("ego", "v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 10).select("ego", "v")
      val oldNext = adj
        .join(keep, Seq("ego", "v"), "left_semi")
        .join(keep.withColumnRenamed("v", "u"), Seq("ego", "u"), "left_semi")
      val qeOld = oldNext.queryExecution
      qeOld.toRdd.count()
      val po = qeOld.executedPlan.toString
      System.err.println("---- old form round 1 (final) ----")
      System.err.println(po.linesIterator.take(40).mkString("\n"))
      val json = s"""{"metric":"kcore_plan_probe","dir":"$dir","round1_dead":$nDead,""" +
        s""""broadcast_anti":${p.contains("BroadcastHashJoin") && p.contains("LeftAnti")},""" +
        s""""smj":${p.contains("SortMergeJoin")},"shj":${p.contains("ShuffledHashJoin")},""" +
        s""""old_broadcast_semi":${po.contains("BroadcastHashJoin") && po.contains("LeftSemi")},""" +
        s""""old_smj":${po.contains("SortMergeJoin")},"old_shj":${po.contains("ShuffledHashJoin")}}"""
      dead.unpersist(blocking = false)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
      println("GRAFT_KCOREAB_JSON")
      println(json)
      spark.stop()
      return
    }

    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def runOld(): (Long, Double) =
      timed(kcoreOld(pairsDf(), k = 10, rounds = 8, parts).count())
    def runNew(): (Long, Double) =
      timed(graft.snap.GraphAnalytics.kcore(pairsDf(), k = 10, rounds = 8, parts).count())

    // Alternate old/new twice each: position effects (JIT, cache decay)
    // hit both arms symmetrically.
    val o1 = runOld(); val n1 = runNew(); val o2 = runOld(); val n2 = runNew()
    require(o1._1 == n1._1 && o2._1 == n2._1 && o1._1 == o2._1,
      s"old/new peel disagree on node count: $o1 $n1 $o2 $n2")

    def fmt(d: Double) = "%.2f".format(d)
    val json =
      s"""{"metric":"kcore_ab","dir":"$dir","kcore_nodes":${o1._1},""" +
        s""""old_walls_sec":[${fmt(o1._2)},${fmt(o2._2)}],""" +
        s""""new_walls_sec":[${fmt(n1._2)},${fmt(n2._2)}],""" +
        s""""speedup_min_over_min":${fmt(math.min(o1._2, o2._2) / math.min(n1._2, n2._2))}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_KCOREAB_JSON")
    println(json)
    spark.stop()
  }
}
