package graft.snap

import graft.SparkSuite
import graft.golden.Golden

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-file replication against the committed reference outputs
  * (`/root/reference/output/{0,107}.{proofs,metrics}`).
  *
  * Proofs files and the metrics header/counts are compared byte-exact.
  * Clustering lines are compared as a MULTISET of byte-exact lines: the
  * reference appended them in async HTTP completion order (one Cypher
  * query per friend, `main.js:90-104`), which is not reproducible.
  */
class GoldenSpec extends SparkSuite {

  private lazy val outputs: Map[String, Golden.EgoOutputs] =
    Golden.render(EgoGraphs.load(spark, GraphSuite.dataDir))

  private def golden(name: String): String =
    Files.readString(Paths.get(s"/root/reference/output/$name"))

  for (ego <- Seq("0", "107")) {
    test(s"$ego.proofs replicates byte-exact") {
      assert(outputs(ego).proofs == golden(s"$ego.proofs"))
    }

    test(s"$ego.metrics: header + node/edge counts byte-exact") {
      assert(outputs(ego).metrics.linesIterator.take(3).toSeq ==
        golden(s"$ego.metrics").linesIterator.take(3).toSeq)
    }

    test(s"$ego.metrics: clustering lines are the exact multiset") {
      def ccLines(s: String) =
        s.linesIterator.filter(_.startsWith("Clustering")).toSeq.sorted
      val ours = ccLines(outputs(ego).metrics)
      val ref = ccLines(golden(s"$ego.metrics"))
      assert(ours.size == ref.size)
      assert(ours == ref)
    }
  }

  test("all ten ego networks produce proofs and metrics") {
    assert(outputs.keySet == Set("0", "107", "348", "414", "686",
      "698", "1684", "1912", "3437", "3980"))
    outputs.values.foreach { o =>
      assert(o.proofs.linesIterator.size == 5)
      assert(o.metrics.linesIterator.size >= 3)
    }
  }

  test("ego 3980 (empty hypothesis set) renders NaN percentage like JS") {
    assert(outputs("3980").proofs.contains("Percentage of the latter: NaN"))
    assert(outputs("3980").proofs.contains("disproved"))
  }
}
