package graft.ext

import graft.SparkSuite

/** q136/q137 are exact-result operators whose VALUE is the pruning layer
  * in front of the exact work — so the spec pins (a) exactness against the
  * un-pruned path and (b) that the pruning layer is really present/active.
  */
class ScaleOpsSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.01"

  test("q136: bloom prefilter result equals the exact no-bloom path") {
    import org.apache.spark.sql.functions._
    val withBloom = graft.SparkEntry.queries("q136_bloom_decontam")(spark, sf)
      .collect().map(_.getLong(0))
    // Exact path: plain shuffle join train-grams x eval-grams, no bloom.
    val g = spark.table("q136_grams") // registered by the query run above
    val bad = g.filter(col("doc_id") >= 10 && col("doc_id") < 190).as("t")
      .join(g.filter(col("doc_id") >= 190).select(col("h")), "h")
      .select(col("doc_id")).distinct()
    val exact = spark.table("q136_docs")
      .filter(col("doc_id") >= 10 && col("doc_id") < 190)
      .join(bad, Seq("doc_id"), "left_anti")
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(withBloom.sameElements(exact))
    assert(withBloom.nonEmpty && withBloom.length < 180) // some docs really drop
  }

  test("q136: plan probes the bloom before the join, no cartesian") {
    val p = graft.SparkEntry.queries("q136_bloom_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q137: prune skips files yet equals the full-scan answer") {
    import org.apache.spark.sql.functions._
    val (res, kept, total) = ScaleOps.fileSkip(spark, sf)
    assert(total >= 8, s"layout produced only $total files")
    assert(kept < total, s"prune kept all $total files")
    val got = res.collect()
    val want = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate").between(
        lit("1995-01-01").cast("timestamp"), lit("1995-03-31").cast("timestamp")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        sum(expr("l_orderkey % 1000000007")).as("key_checksum"))
      .orderBy("l_returnflag").collect()
    assert(got.sameElements(want), s"got=${got.toSeq} want=${want.toSeq}")
  }
}
