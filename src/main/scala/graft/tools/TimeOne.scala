package graft.tools

import graft.{Sessions, SparkEntry}

/** Time a single query without the full Bench protocol — the iteration
  * loop for plan tuning: `sbt "runMain graft.tools.TimeOne <query> [runs]"`
  * with `SPARK_GRAFT_SF_DIR` selecting the scale. Same noop-write action
  * as Bench (materializes every row, no sink I/O). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local("graft-timeone", freezeTolerant = true)
    args.headOption.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // drop run 0 (warm-up)
      println(f"TIMEONE $name warmup=${times.head}%.3f " +
        times.tail.map(t => f"$t%.3f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
