package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class TextGapsSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q128 approx_top_k is exact when capacity covers the vocabulary") {
    // With maxItemsTracked >= the fixture vocabulary the sketch tracks
    // every item, so estimated counts must EQUAL the exact hash-agg
    // counts, and nothing above the returned minimum may be missed.
    val approx = TextSuite.specs.find(_.name == "q128_approx_topk").get.run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.size == 20)
    val exact = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (tok, est) =>
      assert(exact.get(tok).contains(est), s"$tok est=$est exact=${exact.get(tok)}")
    }
    val minReturned = approx.values.min
    val missedBigger = exact.filter { case (t, c) =>
      c > minReturned && !approx.contains(t)
    }
    assert(missedBigger.isEmpty, s"missed heavier items: $missedBigger")
  }
}
