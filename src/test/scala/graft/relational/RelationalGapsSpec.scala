package graft.relational

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class RelationalGapsSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q34 approx_count_distinct within 5% of exact per group") {
    val apx = RelationalSuite.byName("q34_approx_distinct").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(countDistinct(col("o_custkey")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(apx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val a = apx(k)
      assert(math.abs(a - ex).toDouble / ex <= 0.05, s"$k: apx=$a exact=$ex")
    }
  }

  test("every declared query runs at sf0.001 and respects its schema") {
    graft.SparkEntry.allSpecs.foreach { spec =>
      val df = spec.run(spark, sf)
      assert(df.columns.nonEmpty, spec.name)
      assert(df.limit(1).count() >= 0, spec.name)
    }
  }
}
