package graft.snap

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property: the distributed last-wins decode is
  * equivalent to the reference's sequential JS-object-overwrite model
  * (`main.js:185-197`) for arbitrary feature tables with duplicate keys
  * and arbitrary bit vectors. (Driven manually — the scalatest-scalacheck
  * bridge isn't in the offline dependency set.) */
class DecodePropertySpec extends SparkSuite {

  private val genCase: Gen[(Seq[(Int, String, String)], Seq[String])] = for {
    n <- Gen.choose(1, 12)
    keys <- Gen.listOfN(n, Gen.oneOf("k1", "k2", "k3")) // force collisions
    bits <- Gen.listOfN(n, Gen.oneOf("0", "1"))
  } yield (keys.zipWithIndex.map { case (k, i) => (i, k, s"v$i") }, bits)

  test("distributed decode == sequential overwrite model (15 generated cases)") {
    import spark.implicits._
    val params = Gen.Parameters.default
    (0 until 15).foreach { trial =>
      val (featnames, bits) = genCase.pureApply(params, Seed(trial.toLong))

      val featsDf = Seq(("t", "n1", bits)).toDF("ego", "node", "bits")
      val fnDf = featnames.map { case (i, k, v) => ("t", i, k, v) }
        .toDF("ego", "idx", "key", "value")
      val got = EgoGraphs.decode(featsDf, fnDf).collect()
        .headOption.map(_.getAs[Map[String, String]]("properties"))
        .getOrElse(Map.empty[String, String])

      // Reference model: iterate bits in order, overwrite on key collision.
      var expected = Map.empty[String, String]
      bits.zipWithIndex.foreach { case (b, i) =>
        if (b == "1") featnames.find(_._1 == i).foreach { case (_, k, v) =>
          expected += (k -> v)
        }
      }
      assert(got == expected,
        s"trial $trial: featnames=$featnames bits=$bits got=$got expected=$expected")
    }
  }
}
