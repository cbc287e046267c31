package graft.sources

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Source-format coverage beyond parquet and SNAP text: CSV (with header,
  * schema'd read), JSON-lines, and ORC (built-in — orc-core ships with
  * Spark), exercised as write→read round trips whose results must equal
  * the parquet originals — so the oracle is just the parquet-table SQL
  * and the round trip itself is the operator under test. (Avro stays
  * uncovered: the spark-avro DATASOURCE module is not on the classpath —
  * only the avro library jar Spark uses internally.)
  */
object SourceFormats {

  // Round-trip files must outlive the query (the returned DataFrame reads
  // them lazily), so they live under one JVM-lifetime root removed by a
  // shutdown hook instead of leaking a dir per invocation.
  private lazy val root: java.nio.file.Path = {
    val r = Files.createTempDirectory("graft-roundtrip")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.TmpFiles.deleteRecursively(r.toString)))
    r
  }

  private def roundTripDir(prefix: String): String =
    root.resolve(prefix).toString

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q60_csv_roundtrip",
      (s, d) => {
        val dir = roundTripDir("graft-csv")
        val src = Tables(s, d, "customer")
        src.write.mode("overwrite").option("header", "true").csv(dir)
        s.read.option("header", "true").schema(src.schema).csv(dir)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("c"),
            sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
          .orderBy("c_mktsegment")
      },
      Some("SELECT c_mktsegment, count(*) AS c, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal " +
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    QuerySpec("q61_json_roundtrip",
      (s, d) => {
        val dir = roundTripDir("graft-json")
        val src = Tables(s, d, "part")
        src.write.mode("overwrite").json(dir)
        s.read.schema(src.schema).json(dir)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("c"), max("p_size").as("max_size"))
          .orderBy("p_brand")
      },
      Some("SELECT p_brand, count(*) AS c, max(p_size) AS max_size " +
        "FROM part GROUP BY p_brand ORDER BY p_brand")),

    QuerySpec("q71_orc_roundtrip",
      (s, d) => {
        val dir = roundTripDir("graft-orc")
        val src = Tables(s, d, "supplier")
        src.write.mode("overwrite").orc(dir)
        s.read.schema(src.schema).orc(dir)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("c"),
            sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
          .orderBy("s_nationkey")
      },
      Some("SELECT s_nationkey, count(*) AS c, " +
        "CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"))
  )
}
