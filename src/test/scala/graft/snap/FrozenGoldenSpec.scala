package graft.snap

import graft.SparkSuite
import graft.golden.Golden

import java.nio.file.{Files, Paths}

/** Regression pin for the 8 ego networks the reference never committed
  * outputs for, plus the centrality sections it could never produce
  * (SURVEY §5.2 item 1: "self-consistent goldens — generated once,
  * reviewed, frozen"). The frozen files live in
  * `src/test/resources/golden/`; any semantic drift in the pipeline
  * breaks this suite even where no reference golden exists. */
class FrozenGoldenSpec extends SparkSuite {

  private lazy val outputs: Map[String, Golden.EgoOutputs] =
    Golden.render(EgoGraphs.load(spark, GraphSuite.dataDir), withCentrality = true)

  private def frozen(name: String): String = {
    val p = Paths.get(s"src/test/resources/golden/$name")
    Files.readString(p)
  }

  private val egos = Seq("0", "107", "348", "414", "686", "698",
    "1684", "1912", "3437", "3980")

  test("all ten .proofs files match the frozen goldens byte-exact") {
    egos.foreach { ego =>
      assert(outputs(ego).proofs == frozen(s"$ego.proofs"), s"ego $ego")
    }
  }

  test("all ten .metrics files match the frozen goldens (line multiset)") {
    egos.foreach { ego =>
      val ours = outputs(ego).metrics.linesIterator.toSeq
      val ref = frozen(s"$ego.metrics").linesIterator.toSeq
      assert(ours.take(3) == ref.take(3), s"ego $ego header")
      assert(ours.sorted == ref.sorted, s"ego $ego body multiset")
    }
  }

  test("frozen centrality sections are present and non-trivial") {
    egos.foreach { ego =>
      val cent = frozen(s"$ego.metrics").linesIterator
        .count(_.startsWith("Centrality value for"))
      assert(cent > 0, s"ego $ego has no centrality lines")
    }
  }
}
