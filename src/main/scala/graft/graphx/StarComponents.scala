package graft.graphx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star
  * contractions (the MapReduce CC algorithm of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * literature), expressed relationally: each round is two hash-agg +
  * join passes over a SHRINKING edge list, and the round count grows
  * ~logarithmically in component size, INDEPENDENT OF GRAPH DIAMETER.
  *
  * Why this exists next to GraphX `connectedComponents` (g08): label
  * propagation needs one synchronized round per hop of the component
  * eccentricity — measured on the r14 long-diameter chain fixture it
  * took a 63-round fixpoint, and on the 1M-node tree fixture ~600 s of
  * wall that halving the edge volume did not move (per-round cost is
  * vertex-ship/round-bound). At 100 TB a diameter-bound round count is
  * the wrong contract for path-shaped data (supply chains, citation
  * chains, long dedup families); star contraction is the
  * shuffle-bounded, log-round shape. Both converge to the SAME labels
  * (component-min vertex id), so the two implementations cross-oracle
  * each other bit-exactly — StarComponentsSpec pins that on random and
  * chain graphs, and tools.StarCcCheck replays it against the dumped
  * 1M-node GraphX labels.
  *
  * Semantics per round (E is a set of undirected pairs, kept oriented
  * child > parent):
  *  - large-star: for every vertex u over the SYMMETRIC neighborhood,
  *    m = min(Γ(u) ∪ u); emit (v → m) for each neighbor v > u.
  *    (Strictly-greater neighbors hook onto u's minimum — connectivity
  *    preserved because (u,v) itself is re-derivable from v's side.)
  *  - small-star: orient every edge child > parent; for every u,
  *    m = min(N(u)) over its parents; emit (v → m) for each parent
  *    v ≠ m and (u → m). (All parents and u collapse onto the minimum.)
  * The fixpoint is a forest of depth-1 stars rooted at component
  * minima; labels read off as child → root, roots labeling themselves.
  *
  * Fixpoint detection: a cheap (count, modular-checksum) probe per
  * round, CONFIRMED by an exact anti-join only when the probe repeats —
  * the checksum never declares convergence on its own (q103 discipline:
  * modular sums, not raw BIGINT sums, and probabilistic equality is
  * never trusted as set equality).
  *
  * Scale posture: no driver-side state (the probe is a 2-long
  * aggregate); per-round results localCheckpoint so lineage stays
  * shallow (the q97/kcore staging discipline); every shuffle keys on
  * vertex ids; the edge list only shrinks (large-star drops settled
  * edges, small-star dedups onto minima).
  */
object StarComponents {

  /** Drop the cached blocks behind a localCheckpointed frame (the
    * materialize-then-release Pregel/kcore discipline, ADVICE r14: the
    * loop previously accumulated up to maxRounds edge-list snapshots in
    * block storage). Only safe once nothing will read the frame again —
    * a localCheckpoint has no lineage to recompute from. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  /** (id, label) for every vertex of `pairs` — one row per distinct
    * endpoint; label = component-min vertex id (bit-identical to GraphX
    * connectedComponents on the same pairs). `pairs` columns: (u, v),
    * one row per undirected pair (self-loops ignored). */
  def run(spark: SparkSession, pairs: DataFrame, maxRounds: Int = 64): DataFrame =
    runWithRounds(spark, pairs, maxRounds)._1

  /** [[run]] plus the number of large+small-star rounds executed — the
    * round count IS the scale claim (log in component size, not
    * diameter), so the at-scale tool records it. */
  def runWithRounds(spark: SparkSession, pairs: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
    var e = pairs
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    // All vertices, captured BEFORE contraction (interior nodes vanish
    // from the edge list as they hook onto roots).
    val vertices = pairs.select(col("u").as("id"))
      .unionAll(pairs.select(col("v").as("id"))).distinct().localCheckpoint()

    def probeOf(d: DataFrame): (Long, Long) = {
      val r = d.agg(
        count(lit(1)),
        coalesce(sum(expr("((u % 1000000007) * 31 + (v % 1000000007)) % 1000000007")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prevProbe = probeOf(e)
    var converged = prevProbe._1 == 0L
    var r = 0
    while (!converged && r < maxRounds) {
      // ---- large-star ---------------------------------------------------
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("m"))
        .select(col("u"), least(col("m"), col("u")).as("m"))
      val large = sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
      // ---- small-star ---------------------------------------------------
      val o = large
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins2 = o.groupBy("u").agg(min("v").as("m"))
      val next = o.join(mins2, "u")
        .select(explode(array(col("v"), col("u"))).as("c"), col("m"))
        .where(col("c") =!= col("m"))
        .select(col("c").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint()
      val probe = probeOf(next)
      if (probe == prevProbe) {
        // Exact confirmation: equal counts + empty one-direction
        // difference ⟹ equal sets (both sides are post-distinct).
        converged = next.join(e, Seq("u", "v"), "left_anti").isEmpty
      }
      prevProbe = probe
      // `next` is materialized (eager localCheckpoint) and the
      // convergence join above was the last read of the prior round —
      // release its checkpoint blocks before reassigning, so the loop
      // holds at most two snapshots at any time instead of one per
      // round (ADVICE r14). The INITIAL e shares no blocks with
      // `vertices`, which stays checkpointed for the label read-off.
      releaseCheckpoint(e)
      e = next
      r += 1
    }
    require(converged, s"star contraction did not converge in $maxRounds rounds")
    // Children point at their root; roots (and isolated vertices — any
    // vertex never appearing as a child) label themselves.
    val labels = vertices.join(e.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("label"))
    (labels, r)
  }
}
