package graft.tools
object PlanDumpScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries("q135_ann_ivfpq")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/q135_plan.txt"), p)
    spark.stop()
  }
}
