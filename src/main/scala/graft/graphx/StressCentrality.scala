package graft.graphx

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General-graph stress centrality with the reference's semantics
  * (`/root/reference/src/main.js:108-125`): for each countable node x,
  * the number of shortest paths p over all ORDERED endpoint pairs
  * (s, d), s ≠ d, |p| > 1, with x strictly interior.
  *
  * This is the ≥3-diameter generalization and independent cross-check of
  * [[graft.snap.GraphAnalytics.centralityClosedForm]] (which is exact for
  * ego networks, where every shortest path has length ≤ 2).
  *
  * Algorithm: one synchronized multi-source Pregel BFS computing, per
  * vertex, `source → (distance, σ)` where σ is the shortest-path count —
  * σ contributions for a (vertex, source) pair all arrive in the single
  * superstep where that distance is first reached, so each entry is
  * written exactly once (no double counting). Then
  * `stress(x) = Σ_{(s,d)} σ(s,x)·σ(x,d)` over ordered pairs with
  * `dist(s,x) + dist(x,d) = dist(s,d) > 1`, s ≠ x ≠ d.
  *
  * State is O(V) per vertex: meant for validation at test scale. The
  * production path for diameter-2 graphs is the closed form (one
  * self-join); for truly large general graphs one would run Brandes-style
  * source-batched BFS instead.
  */
object StressCentrality {

  type PathMap = Map[VertexId, (Int, Long)]

  private def mergeMaps(a: PathMap, b: PathMap): PathMap =
    (a.keySet ++ b.keySet).iterator.map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((da, sa)), Some((db, sb))) =>
          if (da < db) k -> (da, sa)
          else if (db < da) k -> (db, sb)
          else k -> (da, sa + sb)
        case (Some(v), None) => k -> v
        case (None, Some(v)) => k -> v
      }
    }.toMap

  /** Per-vertex map of every reachable source → (distance, #shortest paths).
    *
    * Explicit synchronized BFS loop (aggregateMessages + outerJoinVertices)
    * rather than `Pregel`: state is (settled entries, this round's fresh
    * entries), only fresh entries are forwarded, and every round clears the
    * frontier of non-receiving vertices. (Pregel's active-set semantics
    * would re-send a stale frontier from an inactive endpoint of a
    * half-active triplet forever.) σ contributions for a (vertex, source)
    * pair all arrive in the single round where that distance is first
    * reached, so each entry is written exactly once — no double counting. */
  def allPairs[VD: scala.reflect.ClassTag, ED: scala.reflect.ClassTag](
      graph: Graph[VD, ED]): VertexRDD[PathMap] = {
    // 2D edge partitioning bounds vertex replication at sqrt(numParts) —
    // the right default before iterative GraphX jobs at scale.
    var g: Graph[(PathMap, PathMap), ED] = graph
      .partitionBy(PartitionStrategy.EdgePartition2D)
      .mapVertices((id, _) =>
        (Map(id -> (0, 1L)): PathMap, Map(id -> (0, 1L)): PathMap)).cache()
    var active = 1L
    while (active > 0) {
      val msgs = g.aggregateMessages[PathMap](
        ctx => {
          def bump(m: PathMap): PathMap = m.map { case (k, (d, s)) => k -> (d + 1, s) }
          if (ctx.srcAttr._2.nonEmpty) ctx.sendToDst(bump(ctx.srcAttr._2))
          if (ctx.dstAttr._2.nonEmpty) ctx.sendToSrc(bump(ctx.dstAttr._2))
        },
        mergeMaps)
      val next = g.outerJoinVertices(msgs) { (_, st, msgOpt) =>
        msgOpt match {
          case Some(m) =>
            val fresh = m.filter { case (k, _) => !st._1.contains(k) }
            (st._1 ++ fresh, fresh)
          case None => (st._1, Map.empty: PathMap)
        }
      }.cache()
      active = next.vertices.filter(_._2._2.nonEmpty).count()
      g.unpersist(blocking = false)
      g = next
    }
    g.vertices.mapValues(_._1)
  }

  /** Stress centrality for every vertex satisfying `countable` (the
    * reference counts friends only — the ego can be interior but is never
    * counted or used as an endpoint). `edges` are undirected, ONE tuple
    * per pair (both-direction duplicates would double every σ).
    *
    * Fully distributed: the per-vertex path maps never leave the
    * executors. The σ(s,x)·σ(x,d) combination is a self-join of the
    * flattened (x, endpoint, dist, σ) entries on x, validated against the
    * endpoint-pair distance table — all shuffles keyed on vertex/pair ids,
    * nothing driver-side. Returns (id BIGINT, centrality BIGINT), one row
    * per countable vertex (zeros included). */
  def stress(spark: SparkSession, edges: RDD[(VertexId, VertexId)],
      countable: VertexId => Boolean): DataFrame = {
    import spark.implicits._
    val graph = Graph.fromEdgeTuples(edges, ())
    val maps = allPairs(graph)
    // (x, e, dist(x,e), σ(x,e)) for every reachable endpoint e ≠ x.
    // Symmetric in (x, e) for undirected graphs, so one flatten serves
    // both the interior-leg and the endpoint-pair-distance roles.
    val ent = maps.flatMap { case (x, m) =>
      m.iterator.collect { case (e, (dd, sig)) if e != x => (x, e, dd, sig) }
    }.cache()
    val legs = ent
      .filter { case (x, e, _, _) => countable(x) && countable(e) }
      .toDF("x", "e", "de", "se")
    val pairDist = ent
      .filter { case (a, b, dd, _) => dd > 1 && countable(a) && countable(b) }
      .map { case (a, b, dd, _) => (a, b, dd) }
      .toDF("s", "d", "dsd")
    val contrib = legs.select(col("x"), col("e").as("s"),
        col("de").as("dsx"), col("se").as("ssx"))
      .join(legs.select(col("x"), col("e").as("d"),
        col("de").as("dxd"), col("se").as("sxd")), "x")
      .where(col("s") =!= col("d"))
      .join(pairDist, Seq("s", "d"))
      .where(col("dsx") + col("dxd") === col("dsd"))
      .groupBy(col("x"))
      .agg(sum(col("ssx") * col("sxd")).as("centrality"))
    val out = maps.keys.filter(countable).toDF("x")
      .join(contrib, Seq("x"), "left")
      .select(col("x").as("id"),
        coalesce(col("centrality"), lit(0L)).as("centrality"))
      .cache()
    // Materialize (one small row per countable vertex), then release the
    // O(V²)-entry intermediate — otherwise every stress() call leaks a
    // cached RDD for the session lifetime.
    out.count()
    ent.unpersist(blocking = false)
    out
  }

  /** Packed frontier message: bit i of `mask` set ⇔ batch source i has an
    * entry; `sig(j)` is the value for the j-th set bit in ascending bit
    * order. Primitive throughout — the per-edge/per-merge cost is bitwise
    * ops and Long adds, and Kryo ships it as one varint + one primitive
    * array (the boxed `Map[VertexId, (Int, Long)]` encoding this replaced
    * made 1M-node forward rounds allocation-bound: measured 16→30→55 min
    * per round on a 1M-node/44M-edge derived graph before the switch). */
  private type Packed = (Long, Array[Long])

  /** Merge two packed messages by summing values on the mask union.
    * Both inputs keep values in ascending-set-bit order, so a single
    * synchronized sweep over the union mask aligns them. */
  private def mergePacked(a: Packed, b: Packed): Packed = {
    val m = a._1 | b._1
    val out = new Array[Long](java.lang.Long.bitCount(m))
    var ia = 0; var ib = 0; var io = 0
    var mm = m
    while (mm != 0L) {
      val i = java.lang.Long.numberOfTrailingZeros(mm)
      var v = 0L
      if (((a._1 >>> i) & 1L) == 1L) { v += a._2(ia); ia += 1 }
      if (((b._1 >>> i) & 1L) == 1L) { v += b._2(ib); ib += 1 }
      out(io) = v; io += 1
      mm &= mm - 1L
    }
    (m, out)
  }

  /** Pack `values(i)` for every set bit of `mask` (ascending bit order). */
  private def packBits(mask: Long, values: Array[Long]): Packed = {
    val out = new Array[Long](java.lang.Long.bitCount(mask))
    var mm = mask; var io = 0
    while (mm != 0L) {
      out(io) = values(java.lang.Long.numberOfTrailingZeros(mm))
      io += 1; mm &= mm - 1L
    }
    (mask, out)
  }

  /** Brandes-style source-batched stress centrality — the general-graph
    * SCALE path. [[allPairs]] carries O(V) state per vertex and [[stress]]
    * flattens an O(V²) (vertex, source) entry table through a self-join;
    * both are validation-scale shapes. Here each round seeds only a batch
    * of ≤ `batchSize` countable sources (the sorted source-id list —
    * O(sources), the caller's sampling knob, NOT O(V) — is collected once
    * and sliced by rank; each ≤ 64-id slice rides into the closures), runs
    * a synchronized forward BFS with O(batch) per-vertex PRIMITIVE state —
    * batch sources are indexed 0..k-1, so a vertex holds `dist:
    * Array[Int]` / `sigma: Array[Long]` and the frontier is a Long bitmask
    * (hence `batchSize ≤ 64`); messages are [[Packed]] — then accumulates
    *   ψ_s(v) = Σ_{w ∈ succ_s(v)} ([w countable] + ψ_s(w))
    * BACKWARD down each source's BFS DAG (messages only along
    * depth-descending triplet sides, one synchronized round per depth
    * level), where ψ_s(v) counts the countable targets t with v interior
    * weighted by the DAG path count v→t. Then
    *   stress(v) += Σ_{s ∈ batch, s ≠ v} σ_s(v)·ψ_s(v)
    * — the interior product without ever joining two full legs. Peak
    * state is O(batchSize) primitives per vertex; total work O(V·E)
    * spread over V/batchSize rounds. Agreement with the [[stress]] join
    * form is property-tested on random diameter-≥3 graphs
    * (StressCentralitySpec).
    */
  def batchedStress(spark: SparkSession, edges: RDD[(VertexId, VertexId)],
      countable: VertexId => Boolean, batchSize: Int = 64,
      onPhase: (String, Double) => Unit = (_, _) => ()): DataFrame = {
    import spark.implicits._
    require(batchSize >= 1 && batchSize <= 64,
      s"batch frontier state is a Long bitmask: batchSize must be 1..64, got $batchSize")
    // Per-phase wall reporting for at-scale evidence (r13 verdict items
    // 3/4): `onPhase` receives ("b<i>_fwd_r<round>" | "b<i>_bwd" |
    // "b<i>_total", seconds) as each synchronized step completes, so
    // tools.GraphScale can record per-batch walls (cross-batch
    // accumulation would show as growing b<i>_total) and per-BFS-level
    // forward walls (the O(depth²·E) class grows with exactly this
    // knob). Default no-op — entries and specs are unaffected.
    def phased[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      onPhase(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val base = Graph.fromEdgeTuples(edges, ())
      .partitionBy(PartitionStrategy.EdgePartition2D).cache()
    val ids = base.vertices.keys.filter(countable).cache()
    // All source ids, sorted for deterministic rank-sliced batches.
    // bounded-collect: the caller-bounded sampling set (|sources| ≪ V), never edges/vertex state
    val sources: Array[VertexId] = ids.collect().sorted
    // Regime switch for the backward sweep (same threshold as
    // GraphxAnalytics.iterateFixed): lazy one-job chains below, eager
    // Pregel-ordered materialize-then-release above.
    val nVerts = base.numVertices
    val nBatches = math.max(1, math.ceil(sources.length.toDouble / batchSize).toInt)

    val parts = scala.collection.mutable.ArrayBuffer.empty[RDD[(VertexId, Long)]]
    for (b <- 0 until nBatches) phased(s"b${b}_total") {
      // An empty slice (no countable sources at all) still runs one cheap
      // no-seed round and contributes an empty part — same shape as the
      // non-empty path, so `parts` is never empty below.
      val srcArr: Array[VertexId] =
        sources.slice(b * batchSize, math.min((b + 1) * batchSize, sources.length))
      val k = srcArr.length

      // ---- forward: multi-source BFS seeded with THIS batch only.
      // Vertex state: (dist per source (-1 unreached), σ per source,
      // fresh-this-round bitmask). Arrays are never mutated once
      // published — updates clone (k ≤ 64 primitives).
      //
      // PREGEL ORDER (the r13 1M-node lesson): the next round's messages
      // are materialized BEFORE the predecessor graph is released.
      // Materializing only the new graph's vertices and then unpersisting
      // the old graph releases the old REPLICATED EDGE VIEW that the new
      // graph's triplet computation diff-ships onto — every later round
      // then rebuilds the view from the base graph through ALL prior
      // ships: O(depth²·E). Measured on a 1M-node/44M-edge derived graph
      // as round walls growing 2→5→7→10→19+ min; Spark's own Pregel
      // orders unpersist after the new message count for this reason.
      def fwdMsgs(gr: Graph[(Array[Int], Array[Long], Long), Int]): VertexRDD[Packed] =
        gr.aggregateMessages[Packed](
          ctx => {
            // All fresh entries at every vertex share the same distance
            // (the current round), so the message is just (mask, σ).
            if (ctx.srcAttr._3 != 0L)
              ctx.sendToDst(packBits(ctx.srcAttr._3, ctx.srcAttr._2))
            if (ctx.dstAttr._3 != 0L)
              ctx.sendToSrc(packBits(ctx.dstAttr._3, ctx.dstAttr._2))
          },
          mergePacked)
      var g: Graph[(Array[Int], Array[Long], Long), Int] =
        base.mapVertices { (id, _) =>
          val dist = Array.fill(k)(-1)
          val sigma = new Array[Long](k)
          val i = java.util.Arrays.binarySearch(srcArr, id)
          if (i >= 0) { dist(i) = 0; sigma(i) = 1L; (dist, sigma, 1L << i) }
          else (dist, sigma, 0L)
        }.cache()
      var msgs = fwdMsgs(g).cache()
      var active = msgs.count()
      var round = 0
      while (active > 0) phased(s"b${b}_fwd_r${round + 1}") {
        round += 1
        // Local val: captured by value per round (a shared `round` var
        // boxed into the closure would go stale if a cached partition
        // were recomputed after later rounds advanced it).
        val dNext = round
        val next = g.outerJoinVertices(msgs) { (_, st, msgOpt) =>
          msgOpt match {
            case Some((mask, sig)) =>
              // σ contributions for a (vertex, source) pair all arrive in
              // the single round where that distance is first reached —
              // bits already settled (dist >= 0) are longer paths: drop.
              var freshMask = 0L
              var mm = mask
              while (mm != 0L) {
                val i = java.lang.Long.numberOfTrailingZeros(mm)
                if (st._1(i) < 0) freshMask |= 1L << i
                mm &= mm - 1L
              }
              if (freshMask == 0L) (st._1, st._2, 0L)
              else {
                val dist = st._1.clone(); val sigma = st._2.clone()
                var io = 0; mm = mask
                while (mm != 0L) {
                  val i = java.lang.Long.numberOfTrailingZeros(mm)
                  if (dist(i) < 0) { dist(i) = dNext; sigma(i) = sig(io) }
                  io += 1; mm &= mm - 1L
                }
                (dist, sigma, freshMask)
              }
            case None => (st._1, st._2, 0L)
          }
        }.cache()
        // Computing next's messages materializes next's vertices AND its
        // replicated view (a delta ship, g still cached) — only then is
        // the predecessor releasable. The terminal round costs one
        // no-sender edge scan; `active` counts receiving vertices, which
        // overshoots fresh discoveries by at most the final stale round.
        val nextMsgs = fwdMsgs(next).cache()
        active = nextMsgs.count()
        msgs.unpersist(blocking = false)
        g.unpersist(blocking = false)
        g = next
        msgs = nextMsgs
      }
      msgs.unpersist(blocking = false)
      // `round` overshoots the true BFS depth by the trailing stale
      // round(s); the backward sweep needs the exact deepest level.
      val depth = g.vertices.map { case (_, (dist, _, _)) =>
        var m = 0; var i = 0
        while (i < k) { if (dist(i) > m) m = dist(i); i += 1 }
        m
      }.fold(0)(math.max)

      // ---- backward: ψ flows depth-descending, one round per level.
      // ψ_s(v) is finalized in the round where level = dist_s(v) + 1
      // (all DAG successors already final — levels strictly decrease),
      // and v first SENDS for s at level = dist_s(v) < that. Each vertex
      // receives for a given source exactly once, summed into ψ.
      def bwdMsgs(gr: Graph[(Array[Int], Array[Long], Array[Long]), Int],
          level: Int): VertexRDD[Packed] =
        gr.aggregateMessages[Packed](
          ctx => {
            def contrib(from: (Array[Int], Array[Long], Array[Long]),
                fromId: VertexId,
                to: (Array[Int], Array[Long], Array[Long])): Packed = {
              val cnt = if (countable(fromId)) 1L else 0L
              var mask = 0L
              var i = 0
              while (i < k) {
                if (from._1(i) == level && to._1(i) == level - 1) mask |= 1L << i
                i += 1
              }
              if (mask == 0L) null
              else {
                val out = new Array[Long](java.lang.Long.bitCount(mask))
                var mm = mask; var io = 0
                while (mm != 0L) {
                  out(io) = cnt + from._3(java.lang.Long.numberOfTrailingZeros(mm))
                  io += 1; mm &= mm - 1L
                }
                (mask, out)
              }
            }
            val toSrc = contrib(ctx.dstAttr, ctx.dstId, ctx.srcAttr)
            if (toSrc != null) ctx.sendToSrc(toSrc)
            val toDst = contrib(ctx.srcAttr, ctx.srcId, ctx.dstAttr)
            if (toDst != null) ctx.sendToDst(toDst)
          },
          mergePacked)
      def applyPsi(gr: Graph[(Array[Int], Array[Long], Array[Long]), Int],
          msgs: VertexRDD[Packed]): Graph[(Array[Int], Array[Long], Array[Long]), Int] =
        gr.outerJoinVertices(msgs) { (_, st, msgOpt) =>
          msgOpt match {
            case Some((mask, vals)) =>
              val psi = st._3.clone()
              var mm = mask; var io = 0
              while (mm != 0L) {
                psi(java.lang.Long.numberOfTrailingZeros(mm)) += vals(io)
                io += 1; mm &= mm - 1L
              }
              (st._1, st._2, psi)
            case None => st
          }
        }

      var bg: Graph[(Array[Int], Array[Long], Array[Long]), Int] =
        g.mapVertices((_, st) => (st._1, st._2, new Array[Long](k))).cache()
      val intermediates = scala.collection.mutable.ArrayBuffer.empty[Graph[_, _]]
      intermediates += g
      if (nVerts <= GraphxAnalytics.LazyChainMaxNodes) {
        // Toy regime: the level loop is LAZY — no action per level, the
        // whole sweep runs as ONE job (per-level barrier jobs are pure
        // scheduler overhead at this size); intermediates are released
        // after the batch materializes.
        for (level <- depth to 1 by -1) {
          val next = applyPsi(bg, bwdMsgs(bg, level)).cache()
          intermediates += bg
          bg = next
        }
      } else phased(s"b${b}_bwd") {
        // Scale regime: Pregel order per level — materialize the next
        // level's messages (which builds the new graph's replicated view
        // as a delta ship while the predecessor is still cached), THEN
        // release the predecessor. Same O(depth²·E) recompute trap as the
        // forward loop otherwise.
        var msgsB = if (depth >= 1) bwdMsgs(bg, depth).cache() else null
        for (level <- depth to 1 by -1) {
          val next = applyPsi(bg, msgsB).cache()
          val nextMsgs = if (level > 1) bwdMsgs(next, level - 1).cache() else null
          if (nextMsgs != null) nextMsgs.count()
          else next.vertices.count() // vertex-only access follows
          msgsB.unpersist(blocking = false)
          bg.unpersist(blocking = false)
          bg = next
          msgsB = nextMsgs
        }
      }

      // ---- batch contribution: σ_s(v)·ψ_s(v), v countable, v ≠ s
      // (dist >= 1 excludes the source's own row, dist == 0).
      val part = bg.vertices.flatMap { case (v, (dist, sigma, psi)) =>
        if (!countable(v)) None
        else {
          var tot = 0L
          var i = 0
          while (i < k) {
            if (dist(i) >= 1) tot += sigma(i) * psi(i)
            i += 1
          }
          if (tot != 0L) Some((v, tot)) else None
        }
      }.cache()
      part.count()
      bg.unpersist(blocking = false)
      intermediates.foreach(_.unpersist(blocking = false))
      parts += part
    }

    val summed = spark.sparkContext.union(parts.toSeq)
      .reduceByKey(_ + _).cache()
    summed.count()
    parts.foreach(_.unpersist(blocking = false))
    val out = ids.toDF("x")
      .join(summed.toDF("x", "centrality"), Seq("x"), "left")
      .select(col("x").as("id"),
        coalesce(col("centrality"), lit(0L)).as("centrality"))
      .cache()
    out.count()
    Seq(ids: RDD[_], summed: RDD[_]).foreach(_.unpersist(blocking = false))
    base.unpersist(blocking = false)
    out
  }
}
