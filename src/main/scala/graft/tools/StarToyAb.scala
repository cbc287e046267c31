package graft.tools

import graft.Sessions
import graft.graphx.StarComponents
import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for the r18 toy-regime star-contraction shape
  * (collapsed two-round barriers + scoped AQE-off, see
  * [[StarComponents.BarrierCollapseMaxEdges]]) against the at-scale
  * single-round-under-AQE shape on the same toy fixtures.
  *
  * The STABLE evidence is the scheduler JOB count (the toy-regime
  * constant is job dispatch + Observation sync, and AQE materializes
  * one stage job per exchange — collapsing exchanges into one
  * non-adaptive job is the entire lever); walls are recorded as
  * informational only, palindrome-ordered (CLAUDE.md: single-box walls
  * swing ~2.5-3× with zero code change, so any wall claim needs the
  * ordering to hold across two sessions of this tool). Labels are
  * asserted bit-identical between the arms on every fixture.
  *
  * Usage: StarToyAb <outJson>
  */
object StarToyAb {

  private def fixture(spark: SparkSession, name: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    name match {
      case "path513" => (0L until 512L).map(i => (i, i + 1)).toDF("u", "v")
      case "random3band" =>
        val rnd = new scala.util.Random(42)
        (0 until 3).flatMap { band =>
          val base = band * 1000L
          (0 until 400).map(_ => (base + rnd.nextInt(300), base + rnd.nextInt(300)))
            .filter(t => t._1 != t._2)
        }.toDF("u", "v")
      case "chain2048" => (0L until 2047L).map(i => (i, i + 1)).toDF("u", "v")
    }
  }

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val spark = Sessions.local("graft-star-toy-ab")
    val sc = spark.sparkContext

    def run(tag: String, fx: String, collapse: Long): (Map[Long, Long], Int, Int, Double) = {
      val df = fixture(spark, fx)
      sc.setJobGroup(tag, tag, interruptOnCancel = false)
      val t0 = System.nanoTime()
      val (l, st) = StarComponents.runWithStats(spark, df, collapseMaxEdges = collapse)
      import spark.implicits._
      val labels = l.as[(Long, Long)].collect().toMap // bounded-collect: toy fixtures
      val wall = (System.nanoTime() - t0) / 1e9
      sc.clearJobGroup()
      def jobs(): Int = sc.statusTracker.getJobIdsForGroup(tag).length
      var (prev, cur, spins) = (-1, jobs(), 0)
      while (cur != prev && spins < 50) { Thread.sleep(100); prev = cur; cur = jobs(); spins += 1 }
      (labels, st.rounds, cur, wall)
    }

    def fmt(d: Double) = "%.3f".format(d)
    val blocks = Seq("path513", "random3band", "chain2048").map { fx =>
      // Warm once per fixture (JIT/page-cache first-draw), then the
      // palindrome: toy, single, single, toy.
      run(s"$fx-warm", fx, StarComponents.BarrierCollapseMaxEdges)
      val t1 = run(s"$fx-t1", fx, StarComponents.BarrierCollapseMaxEdges)
      val s1 = run(s"$fx-s1", fx, 0L)
      val s2 = run(s"$fx-s2", fx, 0L)
      val t2 = run(s"$fx-t2", fx, StarComponents.BarrierCollapseMaxEdges)
      require(t1._1 == s1._1 && s1._1 == s2._1 && s2._1 == t2._1,
        s"$fx: toy and single labels must be bit-identical")
      System.err.println(s"[star-toy-ab] $fx: toy jobs ${t1._3}/${t2._3} rounds ${t1._2} " +
        s"walls ${fmt(t1._4)}/${fmt(t2._4)} | single jobs ${s1._3}/${s2._3} rounds ${s1._2} " +
        s"walls ${fmt(s1._4)}/${fmt(s2._4)}")
      s""""$fx":{"toy_jobs":[${t1._3},${t2._3}],"single_jobs":[${s1._3},${s2._3}],""" +
        s""""toy_rounds":${t1._2},"single_rounds":${s1._2},""" +
        s""""toy_walls_sec":[${fmt(t1._4)},${fmt(t2._4)}],""" +
        s""""single_walls_sec":[${fmt(s1._4)},${fmt(s2._4)}],""" +
        s""""labels_equal":true,"n_vertices":${t1._1.size}}"""
    }
    val json = s"""{"metric":"star_toy_ab","order":"warm,toy,single,single,toy",""" +
      s""""collapse_max_edges":${StarComponents.BarrierCollapseMaxEdges},""" +
      blocks.mkString("", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_STARTOYAB_JSON")
    println(json)
    spark.stop()
  }
}
