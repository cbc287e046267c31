package graft.relational

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The 100 TB techniques that don't show up in per-query oracles: bucketed
  * co-located joins (no exchange), partitioned writes with partition
  * pruning, and both demonstrated at plan level — the physical-layout half
  * of the scale posture. */
class ScaleTechniquesSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  /** Set configs for the block, restoring previous values after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val or = Tables(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    or.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // And it still returns the right number of rows.
      assert(joined.count() ==
        li.join(or, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
    }
  }

  test("partitioned write + filter => partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    try {
      Tables(spark, sf, "events")
        .withColumn("etype", col("event_type"))
        .write.mode("overwrite").partitionBy("etype").parquet(dir)
      val pruned = spark.read.parquet(dir).filter(col("etype") === "click")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(etype") ||
        plan.contains("PartitionFilters: [(etype"), plan)
      val expected = Tables(spark, sf, "events")
        .filter(col("event_type") === "click").count()
      assert(pruned.count() == expected)
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("dim-filtered join prunes fact partitions DYNAMICALLY (DPP in the plan)") {
    // The last free-Catalyst scale lever: a partitioned fact joined to a
    // filtered dim must push the dim's surviving keys into the fact SCAN
    // at runtime (via the reused broadcast), not read all partitions and
    // filter post-join. At 100 TB this is the difference between scanning
    // 2/5 of the fact and scanning all of it.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    try {
      Tables(spark, sf, "events")
        .withColumn("etype", col("event_type"))
        .write.mode("overwrite").partitionBy("etype").parquet(dir)
      val fact = spark.read.parquet(dir)
      // The dim must be a REAL source relation (a Seq-backed LocalRelation
      // gets its filter constant-folded away at optimize time) and the
      // predicate must be one the rule deems LIKELY SELECTIVE — an
      // attribute = literal comparison qualifies; a bare boolean column
      // (after `x = true` simplification) does not.
      Seq(("click", "hot"), ("view", "hot"), ("error", "cold"),
        ("purchase", "cold"), ("signup", "cold")).toDF("d_type", "tier")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val dim = spark.read.parquet(s"$dir-dim")
      // The tiny in-memory dim has no column stats for `flagged`, so the
      // stats-based benefit estimate sees 5 surviving keys out of 5
      // partitions and declines DPP; the fallback ratio path is how a
      // stats-less dim is costed in production too.
      val prevUseStats =
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      try {
        val joined = fact.join(dim, col("etype") === col("d_type"))
          .filter(col("tier") === "hot")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("dynamicpruningexpression"),
          s"expected runtime partition pruning in:\n$plan")
        val expected = Tables(spark, sf, "events")
          .filter(col("event_type").isin("click", "view")).count()
        assert(joined.count() == expected)
      } finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", prevUseStats)
    } finally {
      graft.TmpFiles.deleteRecursively(dir)
      graft.TmpFiles.deleteRecursively(s"$dir-dim")
    }
  }

  test("runtime bloom filter from a filtered dim semi-filters the fact scan") {
    // Row-level sibling of DPP: when the fact is NOT partitioned by the
    // join key, Catalyst can still aggregate the filtered dim's surviving
    // keys into a bloom filter and apply might_contain() on the fact side
    // BEFORE the join's shuffle — at 100 TB this turns "shuffle every fact
    // row" into "shuffle the ~selectivity fraction that can match". The
    // application-side size threshold (10 GB default) is lowered to 0 so
    // the sf0.001 fact qualifies; broadcast is disabled because the rule
    // targets shuffle joins (a broadcast join already prunes at the probe).
    val dir = Files.createTempDirectory("graft-bloom").toString
    try {
      Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        .write.mode("overwrite").parquet(s"$dir/fact")
      Tables(spark, sf, "part").select("p_partkey", "p_brand")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
        val joined = fact.join(dim.filter(col("p_brand") === "Brand#13"),
          col("l_partkey") === col("p_partkey"))
        val plan = joined.queryExecution.optimizedPlan.toString
        assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
          s"expected an injected runtime bloom filter in:\n$plan")
        val expected = Tables(spark, sf, "lineitem")
          .join(Tables(spark, sf, "part").filter(col("p_brand") === "Brand#13"),
            col("l_partkey") === col("p_partkey")).count()
        assert(joined.count() == expected)
      }
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // The runtime answer to key skew: one hot key holds ~75% of the fact,
    // so its shuffle partition dwarfs the median; with skew-join handling
    // on, AQE splits that partition into sub-ranges joined independently
    // (the automated form of the manual salting test below). Thresholds
    // are lowered to make the toy sizes register as skew.
    val dir = Files.createTempDirectory("graft-skew").toString
    try {
      spark.range(0, 200000).select(
        when(col("id") < 150000, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(0, 1000).select(col("id").as("k2"), (col("id") * 2).as("w"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB") {
        val j = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("k") === col("k2"))
        val n = j.collect().length
        assert(n == 150000, s"unexpected join cardinality $n")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"expected AQE skew-join split in the final plan:\n$plan")
      }
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("AQE splits the graph wedge join's hub-skewed partition (g03/g04 shape)") {
    // The first skewed exchange the engine hits at 100×: the clustering/
    // centrality wedge join (GraphAnalytics.friendFriendWedges) shuffles
    // adjacency on (ego, vertex), and a power-law hub's key holds Σdeg²
    // of the work. This drives the REAL production operator — not a
    // lookalike — on a synthetic hub graph (one hub of degree n plus a
    // path), asserts AQE splits the hub partition (skew=true), and checks
    // the wedge counts against the graph's closed form, so the skew split
    // is proven result-identical. Ids carry a 40-char pad so the toy rows
    // register against the lowered byte thresholds, mirroring the
    // relational skew test above.
    val dir = Files.createTempDirectory("graft-wedge-skew").toString
    try {
      import spark.implicits._
      val n = 800
      // Incompressible per-id pad: the shuffle writer lz4-compresses map
      // output, and a repeated-char pad deflates below the skew byte
      // threshold no matter how wide it prints.
      val idCache = scala.collection.mutable.Map.empty[Int, String]
      def id(i: Int) = idCache.getOrElseUpdate(i, {
        val r = new scala.util.Random(i)
        f"$i%05d_" + Array.fill(96)(Integer.toString(r.nextInt(36), 36)).mkString
      })
      // Hub 0 — {1..n}; path i — i+1. Triangles (0,i,i+1) make the closed
      // form: eff(hub) = n-1 path edges; eff(1) = eff(n) = 1 (one hub edge
      // among the two neighbours); eff(i) = 2 otherwise.
      val hubEdges = (1 to n).map(i => ("0", id(0), id(i)))
      val pathEdges = (1 until n).map(i => ("0", id(i), id(i + 1)))
      (hubEdges ++ pathEdges).toDF("ego", "src", "dst")
        .write.mode("overwrite").parquet(s"$dir/edges")
      val edges = spark.read.parquet(s"$dir/edges")
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
        val wedges = graft.snap.GraphAnalytics.friendFriendWedges(edges)
        val eff = wedges.collect()
          .map(r => r.getString(1) -> r.getLong(2)).toMap
        assert(eff(id(0)) == n - 1, s"hub eff = ${eff(id(0))}")
        assert(eff(id(1)) == 1 && eff(id(n)) == 1)
        (2 until n).foreach(i => assert(eff(id(i)) == 2, s"eff(${id(i)}) = ${eff(id(i))}"))
        assert(eff.size == n + 1)
        val plan = wedges.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"expected AQE to split the hub-skewed wedge join partition:\n$plan")
      }
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("broadcast threshold governs join strategy; explicit hint overrides it") {
    // The planner lever that decides whether a dim ships to every
    // executor or both sides shuffle: below the size threshold the dim
    // broadcasts; with the threshold off it falls back to a shuffle
    // join; an explicit broadcast() hint restores the broadcast plan
    // regardless — the knob a 100 TB job turns per-join, not globally.
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val pa = Tables(spark, sf, "part").select("p_partkey", "p_brand")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val auto = planOf(li.join(pa, col("l_partkey") === col("p_partkey")))
    assert(auto.contains("BroadcastHashJoin"), auto)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = planOf(li.join(pa, col("l_partkey") === col("p_partkey")))
      assert(!shuffled.contains("BroadcastHashJoin"), shuffled)
      assert(shuffled.contains("SortMergeJoin") || shuffled.contains("ShuffledHashJoin"),
        shuffled)
      val hinted = planOf(li.join(broadcast(pa), col("l_partkey") === col("p_partkey")))
      assert(hinted.contains("BroadcastHashJoin"), hinted)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a shared shuffled intermediate is exchanged ONCE (ReusedExchange)") {
    // Self-joining an aggregate on its own grouping key: both sides need
    // the same hash-partitioned child, and Catalyst must materialize that
    // exchange once and reuse it — at 100 TB the difference between one
    // shuffle of the fact table and two. (A localCheckpoint would also
    // work but gives up lineage; exchange reuse is the free form.)
    // Both columns must be referenced from BOTH sides: column pruning
    // otherwise specializes each side's subtree (one keeps n, the other
    // q) and there is no identical exchange left to reuse — pruning
    // legitimately beats reuse. AQE stitches the reuse in at runtime, so
    // execute first and inspect the final plan.
    val agg = Tables(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
    val joined = agg.as("a").join(agg.as("b"), "l_partkey")
      .select(col("l_partkey"), col("a.n"), col("a.q"), col("b.n").as("n2"), col("b.q").as("q2"))
    joined.collect() // executes THIS QueryExecution, finalizing the adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the shared aggregate's exchange to be reused:\n$plan")
  }

  test("salted two-phase aggregation == direct aggregation (skew-safe form)") {
    // Phase 1 fans a hot key across 16 salt buckets (partial agg), phase 2
    // combines — exact for algebraic aggregates, and the manual form of
    // what AQE skew handling does for joins.
    val li = Tables(spark, sf, "lineitem")
    val salted = li
      .withColumn("salt", pmod(hash(col("l_partkey"), col("l_suppkey")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
        count(lit(1)).as("n"))
      .groupBy("l_returnflag")
      .agg(sum("q").cast("double").as("sq"), sum("n").as("c"))
      .orderBy("l_returnflag").collect()
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sq"),
        count(lit(1)).as("c"))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq == direct.toSeq)
  }
}
