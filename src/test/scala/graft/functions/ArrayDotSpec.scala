package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class ArrayDotSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("array_dot is bit-identical to the zip_with/aggregate HOF on every embedding") {
    val e = Tables(spark, sf, "embeddings")
    val both = e.as("a").crossJoin(e.as("b").limit(5))
      .select(
        expr("array_dot(a.embedding, b.embedding)").as("native"),
        expr("aggregate(zip_with(a.embedding, b.embedding, " +
          "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("double-array variant and interpreted/codegen parity") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.selectExpr("array_dot(a, b)").head().getDouble(0) == 32.0)
    // NO_CODEGEN forces the interpreted nullSafeEval path (wholeStage=false
    // alone still goes through generated MutableProjection).
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.selectExpr("array_dot(a, b)").head().getDouble(0) == 32.0)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("HOF parity on edge cases: ragged lengths and null elements yield NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0))),              // ragged
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(1.0))),        // null element
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))))   // clean
      .toDF("a", "b")
      .selectExpr("array_dot(a, b) AS native",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), " +
          "(acc, v) -> acc + v) AS hof")
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-ness mismatch: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("mixed types fail at analysis with a named error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((Seq(1.0), "x")).toDF("a", "b").selectExpr("array_dot(a, b)").collect()
    }
    assert(e.getMessage.contains("array_dot"))
  }
}
