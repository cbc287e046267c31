// Scratch audit main — run with: sbt "runMain graft.tools.ExplainAudit q10_agg_battery ..."
package graft.tools

import graft.{Sessions, SparkEntry}

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-audit", freezeTolerant = true)
    val names = if (args.nonEmpty) args.toSeq else Seq("q04_join_large", "q10_agg_battery")
    // EXPLAIN_EXEC=1: noop-run the query first and print the AQE FINAL
    // plan (ReusedExchange / stage reuse only shows up post-execution).
    val execMode = sys.env.get("EXPLAIN_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (execMode) {
          // collect() executes THIS df's QueryExecution (a noop write builds
          // its own), so the printed plan is the AQE final one. Exec-mode is
          // for bounded-output queries only.
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        } else println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
