package graft.tools

import graft.Sessions
import graft.graphx.{GraphxAnalytics, StarComponents}
import org.apache.spark.graphx.VertexId
import org.apache.spark.sql.functions._

/** Cross the star-contraction super-hub guard at REAL volume (r17
  * verdict item 3 / ADVICE: `DefaultSuperHubDegree` had never been
  * exceeded by an at-scale run, so the fallback's behavior past the
  * window form's single-task-sort budget was spec-pinned at toy scale
  * only, and the detection-round cost — the one window round a reactive
  * guard cannot avoid on an INPUT super-hub — was argued, not measured).
  *
  * Fixture (generated executor-side via `sc.range`, no driver edge
  * list): a hub with `spokes` (default 2e7 — 2× the danger size)
  * neighbors, plus a (`chainN`+1)-node path grafted onto the hub so the
  * run needs several more rounds AFTER the guard trips — the fallback
  * rounds execute at the observed volume, including the fixpoint
  * mega-star round where the component root's group reaches the full
  * component size. One component; closed-form labels: every vertex → 0
  * (the chain holds the global min id), so correctness is exact without
  * an external oracle: count + a zero-mismatch label check.
  *
  * Runs through the PRODUCTION entry (`componentLabelsWithStats` at the
  * DEFAULT threshold — `spokes` pairs route to the star branch), and
  * records per-round walls (the round-0 window wall IS the measured
  * detection-round cost at `spokes` group size), StarStats (maxGroup
  * must reach ~component size: the fallback rounds' group observation,
  * ADVICE r17), and the guard-trip index.
  *
  * Usage: SuperHubScale <outJson> [spokes=20000000] [chainN=64]
  */
object SuperHubScale {

  /** Hub vertex id — above the chain ids (0..chainN) so the closed-form
    * component min stays 0, below the spoke ids. */
  val HubId = 100L

  /** First spoke id (spokes occupy [SpokeBase, SpokeBase + spokes)). */
  val SpokeBase = 1000L

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val spokes = if (args.length > 1) args(1).toLong else 20000000L
    val chainN = if (args.length > 2) args(2).toLong else 64L
    val spark = Sessions.local("graft-superhub-scale", freezeTolerant = true)
    val sc = spark.sparkContext

    // Spokes generated on the executors (range → map, 32 partitions);
    // the chain + graft edge are a tiny driver-side tail.
    val pairs: org.apache.spark.rdd.RDD[(VertexId, VertexId)] =
      sc.range(SpokeBase, SpokeBase + spokes, numSlices = math.max(sc.defaultParallelism, 2))
        .map(i => (HubId, i))
        .union(sc.parallelize((0L until chainN).map(i => (i, i + 1)) :+ ((HubId, 0L)), 2))
        .cache()
    val nPairs = pairs.count()
    val nNodes = spokes + chainN + 2 // spokes + chain(0..chainN) + hub
    System.err.println(s"[superhub-scale] $nPairs pairs, $nNodes nodes (hub degree ${spokes + 1})")

    val roundWalls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val t0 = System.nanoTime()
    val (labels, branch, statsOpt) = GraphxAnalytics.componentLabelsWithStats(
      spark, pairs, onRound = (name, sec) => {
        roundWalls(name) = sec
        System.err.println(f"[superhub-scale] $name: $sec%.1f s")
      })
    val wall = (System.nanoTime() - t0) / 1e9

    // ---- assertions (closed form — no external oracle needed) ----------
    require(branch == "star", s"$nPairs pairs must route to the star branch (took $branch)")
    val stats = statsOpt.getOrElse(sys.error("star branch must yield StarStats"))
    require(stats.combinerFromRound >= 0,
      s"a ${spokes}-spoke hub must trip the DEFAULT guard (${StarComponents.DefaultSuperHubDegree}" +
        s"/${StarComponents.SuperHubMargin}): $stats")
    require(stats.rounds > stats.combinerFromRound,
      s"fallback rounds must actually have run: $stats")
    // The fallback rounds' group observation must see the mega-star peak
    // (component root 0 collects every other vertex): ≥ hub degree, and
    // at the fixpoint = nNodes - 1.
    require(stats.maxGroup >= spokes,
      s"maxGroup must reach at least the hub degree: $stats")
    val rowCount = labels.count()
    val mismatches = labels.where(col("label") =!= 0L).count()
    require(rowCount == nNodes, s"expected $nNodes labeled vertices, got $rowCount")
    require(mismatches == 0L, s"$mismatches vertices not labeled 0 (closed-form component min)")
    System.err.println(s"[superhub-scale] labels exact: $rowCount vertices all → 0; stats $stats")

    def fmt(d: Double) = "%.2f".format(d)
    val detectionWall = roundWalls.headOption.map(_._2).getOrElse(-1.0)
    val json =
      s"""{"metric":"superhub_scale","spokes":$spokes,"chain_n":$chainN,""" +
        s""""pairs":$nPairs,"nodes":$nNodes,"cc_branch":"$branch",""" +
        s""""super_hub_degree":${StarComponents.DefaultSuperHubDegree},""" +
        s""""super_hub_margin":${StarComponents.SuperHubMargin},""" +
        s""""heap_mb":${Runtime.getRuntime.maxMemory() / (1L << 20)},""" +
        s""""cpus":${Runtime.getRuntime.availableProcessors},""" +
        s""""rounds":${stats.rounds},"max_group":${stats.maxGroup},""" +
        s""""combiner_from_round":${stats.combinerFromRound},""" +
        s""""label_rows":$rowCount,"label_mismatches":$mismatches,""" +
        s""""wall_sec":${fmt(wall)},"detection_round_wall_sec":${fmt(detectionWall)},""" +
        s""""round_walls_sec":${roundWalls.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_SUPERHUB_JSON")
    println(json)
    spark.stop()
  }
}
