package graft.relational

import graft.SparkSuite

/** Plan-level scale assertions: these queries must produce the plan you
  * would want at 100 TB, not just a correct one — filters reaching the
  * parquet scan, projection pruning, small dims broadcast, no shuffled
  * cartesian products. */
class PlanSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter pushed into the parquet scan") {
    val p = plan("q01_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"), p)
  }

  test("q01: scan reads only the two needed columns") {
    val p = plan("q01_filter_agg")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"), read)
    assert(!read.contains("l_extendedprice"), read)
  }

  test("q03: nation dim is broadcast, not shuffled") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q26: single-probe side is broadcast (no shuffled cartesian)") {
    val p = plan("q26_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20 dedup is a hash aggregate, not a sort-based distinct") {
    assert(plan("q20_dedup").contains("HashAggregate"))
  }

  test("q70 batch ANN: candidates come from a bucket equi-join, never a cartesian") {
    val p = plan("q70_ann_batch")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"batch ANN must join on bucket keys:\n$p")
  }
}
