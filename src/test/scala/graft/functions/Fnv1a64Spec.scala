package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Fnv1a64Spec extends SparkSuite {

  test("expression matches the reference implementation (codegen path)") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "key agg row scan", "é中")
    val viaSql = samples.toDF("s")
      .selectExpr("s", "fnv1a64(s) AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(viaSql(s) == Fnv1a64.hash(s.getBytes("UTF-8")), s"mismatch for '$s'")
    }
  }

  test("interpreted and codegen'd evaluation agree") {
    import spark.implicits._
    val df = Seq("x", "yy", "zzz").toDF("s")
    val on = df.selectExpr("fnv1a64(s)").collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.selectExpr("fnv1a64(s)").collect().map(_.getLong(0)).toSeq
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("binary input: expression hash matches the reference Scala implementation") {
    import spark.implicits._
    val viaExpr = Seq("payload bytes").toDF("s")
      .selectExpr("fnv1a64(encode(s, 'UTF-8')) AS h").head().getLong(0)
    assert(viaExpr == graft.functions.Fnv1a64.hash("payload bytes".getBytes("UTF-8")))
  }

  test("type errors are analysis-time, not runtime") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("i").selectExpr("fnv1a64(i)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("fnv1a64"))
  }
}
