// Scratch audit main — run with: sbt "runMain graft.tools.ExplainAudit q10_agg_battery ..."
package graft.tools

import graft.{Sessions, SparkEntry}

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-audit", freezeTolerant = true)
    val names = if (args.nonEmpty) args.toSeq else Seq("q04_join_large", "q10_agg_battery")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
