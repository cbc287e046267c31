package graft.graphx

import graft.SparkSuite
import graft.snap.GraphSuite
import org.apache.spark.sql.functions._

class GraphxAnalyticsSpec extends SparkSuite {

  test("pagerank invariants: mass conserved per ego, ego center is the hub") {
    val pr = GraphxAnalytics.pageranks(spark, GraphSuite.dataDir, Seq("3980", "698"))
      .collect()
    for (ego <- Seq("3980", "698")) {
      val rows = pr.filter(_.getAs[String]("ego") == ego)
      val total = rows.map(_.getAs[Double]("rank")).sum
      // Un-normalized GraphX PageRank sums to ~numVertices.
      assert(math.abs(total - rows.length) / rows.length < 0.02,
        s"ego $ego mass: $total vs ${rows.length}")
      val top = rows.maxBy(_.getAs[Double]("rank"))
      assert(top.getAs[String]("name") == "ego",
        s"ego $ego hub is ${top.getAs[String]("name")}")
      assert(rows.forall(_.getAs[Double]("rank") > 0))
    }
  }

  test("connected components: ego 348 friend graph is connected, 3980 is not") {
    val cc = GraphxAnalytics.componentStats(spark, GraphSuite.dataDir,
      Seq("348", "3980")).collect()
      .map(r => r.getAs[String]("ego") -> r.getAs[Long]("n_components")).toMap
    assert(cc("348") == 1)
    assert(cc("3980") > 1)
  }
}
