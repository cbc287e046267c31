package graft.relational

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe`: metrics accumulated by the executors DURING a job —
  * no second scan. At 100 TB "run the query again to count the rows you
  * dropped" is not an option; observe is how a cleaning funnel exports
  * its per-stage counters for free while the real output is written.
  */
class ObservabilitySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("observe collects funnel counters in the same single pass as the job") {
    val obs = Observation("gate")
    val docs = Tables(spark, sf, "documents")
    val gated = docs
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(col("n_chars") >= 100, 1L).otherwise(0L)).as("n_pass"),
        sum("n_chars").as("chars_in"))
      .filter(col("n_chars") >= 100)
    val kept = gated.count() // the one action: metrics ride along with it

    val m = obs.get
    assert(m("n_in") == docs.count(), m)
    assert(m("n_pass") == kept, m)
    assert(m("chars_in") == docs.agg(sum("n_chars")).head.getLong(0), m)
  }

  test("observed metrics see pre-filter rows even when the filter is pushed down") {
    // The observe node sits between the scan and the filter in the plan;
    // its counters must reflect scan output, not filter output — that is
    // the contract that makes it usable as a data-loss audit point.
    val obs = Observation("audit")
    val li = Tables(spark, sf, "lineitem")
      .observe(obs, count(lit(1)).as("n_scanned"))
      .filter(col("l_quantity") > 25)
    val selected = li.count()
    val all = Tables(spark, sf, "lineitem").count()
    assert(obs.get("n_scanned") == all)
    assert(selected < all)
  }
}
