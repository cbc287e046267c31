package graft.functions

import graft.{SparkSuite, Tables}
import graft.ext.SimilaritySuite
import org.apache.spark.sql.functions._

/** Parity gates for the native `pq_encode` kernel: the q134 similarity
  * path computes through it, so it must be bit-identical to the
  * interpreted HOF argmin formulation it replaced (same left-to-right
  * distance accumulation, same strict-< lowest-index-wins argmin). */
class PqEncodeSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def base = Tables(spark, sf, "embeddings")
    .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("arr"))

  test("pq_encode is bit-identical to the HOF argmin chain on every embedding") {
    import spark.implicits._
    val model = SimilaritySuite.fitPq(spark, sf)
    val native = SimilaritySuite.pqEncode(base, model)
      .as[(Long, Seq[Int])].collect().toMap
    val hof = SimilaritySuite.pqEncodeHof(base, model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(native.nonEmpty && native.keySet == hof.keySet)
    native.foreach { case (id, codes) =>
      assert(codes == hof(id), s"vec $id: native $codes != hof ${hof(id)}")
    }
  }

  test("interpreted/codegen parity and tie-break: equidistant centroids pick the lowest index") {
    import spark.implicits._
    // One subspace of 2 dims, two centroids equidistant from (0,0) plus a
    // strictly-nearer third: argmin must pick index 0 on the tie and 2
    // when strictly nearer.
    val tie = SimilaritySuite.PqModel(1, 2, 3,
      Array(Array(Array(1.0, 0.0), Array(-1.0, 0.0), Array(5.0, 5.0))))
    val near = SimilaritySuite.PqModel(1, 2, 3,
      Array(Array(Array(1.0, 0.0), Array(-1.0, 0.0), Array(0.1, 0.0))))
    val df = Seq((0L, Seq(0.0, 0.0))).toDF("vec_id", "arr")
    def codesOf(m: SimilaritySuite.PqModel): Seq[Int] =
      SimilaritySuite.pqEncode(df, m).as[(Long, Seq[Int])].head()._2
    assert(codesOf(tie) == Seq(0))
    assert(codesOf(near) == Seq(2))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(codesOf(tie) == Seq(0))
      assert(codesOf(near) == Seq(2))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("null semantics: dim mismatch and null elements yield NULL, not garbage") {
    import spark.implicits._
    val model = SimilaritySuite.PqModel(2, 2, 2,
      Array.fill(2)(Array(Array(0.0, 0.0), Array(1.0, 1.0))))
    val rows = Seq(
      (1L, Some(Seq(Some(0.1), Some(0.2), Some(0.9), Some(1.1)))), // clean
      (2L, Some(Seq(Some(0.1), Some(0.2)))),                       // wrong dim
      (3L, Some(Seq(Some(0.1), None, Some(0.9), Some(1.1)))),      // null elem
      (4L, Option.empty[Seq[Option[Double]]]))                     // null array
      .toDF("vec_id", "arr")
    val out = rows.select(col("vec_id"),
      call_function("pq_encode", col("arr"), model.codebookLit).as("codes"))
      .orderBy("vec_id").collect()
    assert(!out(0).isNullAt(1) && out(0).getSeq[Int](1) == Seq(0, 1))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("malformed codebooks yield NULL, not exceptions or -1 codes") {
    import spark.implicits._
    // pq_encode is a registered SQL function — arbitrary literal codebooks
    // must degrade to NULL: empty codebook, empty subspace, null subspace,
    // ragged centroids, and all-NaN distances (argmin never taken).
    val df = Seq((1L, Seq(0.1, 0.2))).toDF("vec_id", "arr")
    val bad = Seq(
      "CAST(array() AS ARRAY<ARRAY<ARRAY<DOUBLE>>>)",
      "array(CAST(array() AS ARRAY<ARRAY<DOUBLE>>))",
      "array(CAST(NULL AS ARRAY<ARRAY<DOUBLE>>))",
      "array(array(CAST(NULL AS ARRAY<DOUBLE>)))",
      "array(array(array(CAST(0.0 AS DOUBLE), 0.0), array(CAST(1.0 AS DOUBLE))))",
      "array(array(array(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE))))")
    bad.foreach { cb =>
      val row = df.select(
        call_function("pq_encode", col("arr"), expr(cb)).as("codes")).head()
      assert(row.isNullAt(0), s"expected NULL for codebook $cb")
    }
  }
}
