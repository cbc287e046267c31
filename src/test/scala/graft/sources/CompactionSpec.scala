package graft.sources

import graft.{SparkSuite, Tables, TmpFiles}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Layout contract behind q103_compaction: the rewrite must actually
  * shrink the file count AND leave each output file with a disjoint time
  * range — that disjointness is what lets a time-filtered scan skip
  * whole files via parquet min/max zone maps at 100 TB.
  */
class CompactionSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("compaction shrinks file count and yields disjoint per-file time ranges") {
    val root = Files.createTempDirectory("graft-compact-spec").toString
    try {
      val frag = s"$root/frag"; val compact = s"$root/compact"
      Tables(spark, sf, "events").repartition(64)
        .write.mode("overwrite").parquet(frag)

      def dataFiles(dir: String): Seq[String] =
        new java.io.File(dir).listFiles().toSeq
          .map(_.getName).filter(_.endsWith(".parquet"))
      assert(dataFiles(frag).size == 64, dataFiles(frag).size)

      spark.read.parquet(frag)
        .repartitionByRange(4, col("ts"), col("event_id"))
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 20000)
        .parquet(compact)
      assert(dataFiles(compact).size <= 4, dataFiles(compact).mkString(","))

      // content identical
      val before = Tables(spark, sf, "events").count()
      assert(spark.read.parquet(compact).count() == before)

      // per-file (min ts, max ts) windows must not interleave: sort by
      // min and require each file's min >= the previous file's max
      // (range partitioning makes boundaries touch at most at one key).
      val ranges = spark.read.parquet(compact)
        .groupBy(input_file_name().as("f"))
        .agg(min(expr("unix_micros(ts)")).as("lo"), max(expr("unix_micros(ts)")).as("hi"))
        .orderBy("lo")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(lo2 >= hi1,
          s"file time ranges interleave: $hi1 vs $lo2")
        case _ =>
      }
    } finally TmpFiles.deleteRecursively(root)
  }
}
