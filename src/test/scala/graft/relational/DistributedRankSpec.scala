package graft.relational

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests for [[DistributedRank]]: the distributed exact rank
  * must equal `row_number() OVER (ORDER BY …)` bit-for-bit — on shuffled
  * fixtures that CARRY PAYLOAD COLUMNS. The payload is the point: column
  * pruning specializes the offsets branch when the frame has non-sort-key
  * columns (q116's exact shape — f and m pruned while ranking on r),
  * which is what defeated ReuseExchange and silently mis-ranked before
  * the frame was materialized once via localCheckpoint. Small data
  * collapses to one partition and hides the bug, so every case here
  * forces multiple range partitions.
  */
class DistributedRankSpec extends SparkSuite {
  import spark.implicits._

  // Deterministic shuffled fixture with payload columns: rank key `r`
  // (with ties — the caller's tie-break must resolve them), unique id,
  // and two payloads the ranking never reads (the pruning trigger).
  private def fixture(n: Int) = (0 until n)
    .map(i => ((i * 2654435761L) % 9973, i.toLong, s"payload-$i", i * 1.5))
    .toDF("r", "id", "f", "m")

  private def expected(n: Int) = {
    val w = Window.orderBy(col("r").desc, col("id").asc)
    fixture(n).withColumn("want", row_number().over(w).cast("long"))
  }

  private def mismatches(parts: Int, n: Int): Long = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val got = DistributedRank.withGlobalRank(
        fixture(n).repartition(parts), "rank", col("r").desc, col("id").asc)
      got.join(expected(n), Seq("r", "id", "f", "m"))
        .filter(col("rank") =!= col("want")).count()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (parts <- Seq(1, 2, 8)) {
    test(s"rank == row_number on a shuffled payload fixture, $parts partition(s)") {
      assert(mismatches(parts, 20000) === 0L)
    }
  }

  test("rank == row_number with AQE disabled (plan shape must not matter)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(mismatches(8, 20000) === 0L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ranks are a permutation of 1..n (no duplicates, no gaps)") {
    // The empirical signature of the pre-fix bug: duplicate ranks and
    // max(rank) != n whenever the two branches sampled different range
    // boundaries.
    val n = 20000
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val ranked = DistributedRank.withGlobalRank(
        fixture(n), "rank", col("r").desc, col("id").asc)
      val stats = ranked.agg(
        countDistinct("rank").as("d"), min("rank").as("lo"), max("rank").as("hi"))
        .as[(Long, Long, Long)].head()
      assert(stats === ((n.toLong, 1L, n.toLong)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("the sorted frame is materialized once (checkpoint visible in plan)") {
    // Both branches must read ONE frozen range partitioning. The eager
    // localCheckpoint surfaces as an ExistingRDD scan in the executed
    // plan; if a refactor drops it, the two branches go back to sampling
    // range boundaries independently and this pin fails before the
    // mis-rank can ship.
    val ranked = DistributedRank.withGlobalRank(
      fixture(1000), "rank", col("r").desc, col("id").asc)
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD"),
      s"expected the checkpointed frame in the plan:\n$plan")
  }
}
