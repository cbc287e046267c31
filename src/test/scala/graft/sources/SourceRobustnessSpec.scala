package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Malformed-input posture for the text sources: a 100 TB feed WILL
  * contain broken lines, and the engine must offer all three contracts —
  * capture (PERMISSIVE + corrupt-record column: keep the raw line for a
  * quarantine table), drop (DROPMALFORMED: count what was lost), and
  * abort (FAILFAST: refuse to silently degrade). Complements the SNAP
  * edge parser's get()-based null-token handling (ADVICE r3). */
class SourceRobustnessSpec extends SparkSuite {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    Files.write(Paths.get(s"$dir/$name"), lines.asJava)
    dir
  }

  test("JSON: corrupt lines are captured PERMISSIVEly, dropped, or fail fast") {
    val dir = writeLines("data.json", Seq(
      """{"id":1,"v":"a"}""",
      """{"id":2,"v":"b"}""",
      """not json at all""",
      """{"id":3,"v":"c"}""",
      """{"id":4,"v":}"""))
    try {
      // PERMISSIVE: good rows parse, broken rows surface with the raw
      // line preserved in the corrupt-record column (the quarantine
      // pattern). Spark refuses to filter on the corrupt column of an
      // uncached scan (it would need a second parse) — cache first.
      val permissive = spark.read
        .schema("id LONG, v STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir).cache()
      try {
        assert(permissive.count() == 5)
        assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
        val quarantined = permissive.filter(col("_corrupt_record").isNotNull)
          .select("_corrupt_record").collect().map(_.getString(0)).toSet
        assert(quarantined.contains("not json at all"), quarantined)
        assert(permissive.filter(col("id").isNotNull).count() == 3)
      } finally { permissive.unpersist(); () }

      val dropped = spark.read.schema("id LONG, v STRING")
        .option("mode", "DROPMALFORMED").json(dir)
      assert(dropped.count() == 3)
      assert(dropped.agg(sum("id")).head().getLong(0) == 6L)

      intercept[Exception] {
        spark.read.schema("id LONG, v STRING")
          .option("mode", "FAILFAST").json(dir).collect()
      }
    } finally graft.TmpFiles.deleteRecursively(dir)
  }

  test("CSV: rows with the wrong shape are captured, dropped, or fail fast") {
    val dir = writeLines("data.csv", Seq(
      "1,a,10",
      "2,b,not_a_number",
      "3,c,30",
      "4,d,40,EXTRA_FIELD"))
    try {
      val schema = "id LONG, v STRING, n LONG, _corrupt_record STRING"
      val permissive = spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir).cache()
      try {
        assert(permissive.count() == 4)
        // The unparseable number and the extra-column row both quarantine;
        // their typed columns degrade to null only where broken.
        assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
        assert(permissive.filter(col("n").isNotNull).count() == 3)
      } finally { permissive.unpersist(); () }

      val dropped = spark.read.schema("id LONG, v STRING, n LONG")
        .option("mode", "DROPMALFORMED").csv(dir)
      assert(dropped.collect().map(_.getLong(0)).toSet == Set(1L, 3L))

      intercept[Exception] {
        spark.read.schema("id LONG, v STRING, n LONG")
          .option("mode", "FAILFAST").csv(dir).collect()
      }
    } finally graft.TmpFiles.deleteRecursively(dir)
  }
}
