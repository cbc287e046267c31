package graft.ext

import graft.SparkSuite
import graft.relational.RelationalSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("LSH ANN recall@10 >= 0.6 vs exact brute-force top-10 (q26)") {
    import spark.implicits._
    val exact = RelationalSuite.byName("q26_cosine_topk").run(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val approx = SimilaritySuite.annTopK(spark, sf, probeId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // Note: q26 ranks by raw dot product, LSH by euclidean distance —
    // related but not identical orderings on non-normalized vectors, so
    // the bar is deliberately moderate.
    assert(recall >= 0.6, s"recall@10 = $recall (exact=$exact approx=$approx)")
  }

  test("IVF ANN recall@10 >= 0.6 vs exact brute-force top-10 (dot product)") {
    import spark.implicits._
    val exact = RelationalSuite.byName("q26_cosine_topk").run(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    // sf0.001 has only ~50 vectors: use fewer, wider cells so nprobe/nlist
    // covers a meaningful corpus fraction (IVF parameters scale with N).
    val ivf = SimilaritySuite.ivfTopK(spark, sf, probeId = 0L, k = 10,
      nlist = 8, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@10 = $recall (exact=$exact ivf=$ivf)")
  }

  test("exact cosine pairs are symmetric-clean: a_id < b_id, cos in [-1,1]") {
    val rows = SimilaritySuite.specs.find(_.name == "q47_cosine_pairs").get
      .run(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
  }
}
