package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CheckpointingSpec extends SparkSuite {

  /** The test session is shared across every suite in the JVM and
    * SparkContext has no public un-set for the checkpoint dir, so this
    * spec restores the private field to None afterwards — otherwise every
    * later DistributedRank/WeightedPaths test would silently flip to
    * reliable mode. */
  private def resetCheckpointDir(): Unit = {
    val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
    f.setAccessible(true)
    f.set(spark.sparkContext, None)
  }

  test("stable(): local by default, reliable (cluster-dir) when configured, identical results") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 501).toLong).toDF("k")
    assert(Checkpointing.mode(df) == "local")
    val local = Checkpointing.stable(df)
    assert(local.count() == 500)

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      assert(Checkpointing.mode(df) == "reliable")
      val reliable = Checkpointing.stable(df)
      assert(reliable.count() == 500)
      // Observable side effect of the reliable path: checkpoint data on
      // the cluster-visible dir (this is what survives executor loss).
      val written = java.nio.file.Files.walk(dir).count()
      assert(written > 1, s"no checkpoint files under $dir")
      assert(reliable.as[Long].collect().sorted.toSeq ==
        local.as[Long].collect().sorted.toSeq)

      // The real call site, reliable mode: exact global rank still equals
      // row_number under a configured checkpoint dir (DistributedRankSpec
      // covers the default local mode).
      val ranked = relational.DistributedRank
        .withGlobalRank(df, "r", col("k"))
      val viaWindow = df.withColumn("r", row_number().over(Window.orderBy("k")).cast("long"))
      assert(ranked.select("k", "r").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
        viaWindow.select("k", "r").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    } finally {
      resetCheckpointDir()
      TmpFiles.deleteRecursively(dir.toString)
    }
    assert(Checkpointing.mode(df) == "local")
  }
}
