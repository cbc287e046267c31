package graft.functions

import graft.{SparkSuite, Tables}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RollingMinHashSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("rolling recurrence equals the rehash-every-window reference (60 generated cases)") {
    val gen = for {
      s <- Gen.nonEmptyListOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
      k <- Gen.choose(1, s.length)
    } yield (s, k)
    val params = Gen.Parameters.default
    (0 until 60).foreach { trial =>
      val (s, k) = gen.pureApply(params, Seed(trial.toLong))
      val b = s.getBytes("UTF-8")
      assert(RollingMinHash.minHash(b, k) == RollingMinHash.minHashNaive(b, k),
        s"trial $trial: s=$s k=$k")
    }
  }

  test("native expression matches a per-window HOF recomputation on real documents") {
    val both = Tables(spark, sf, "documents").limit(50)
      .selectExpr(
        "rolling_minhash(text, 8) AS native",
        // O(n·k) oracle shape: hash every 8-byte window independently.
        "array_min(transform(sequence(1, length(text) - 7), i -> " +
          "aggregate(filter(split(substring(text, i, 8), ''), c -> c <> ''), 0L, " +
          "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007))) AS hof")
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("interpreted/codegen parity and NULL for short input") {
    import spark.implicits._
    val df = Seq(("abcdefghij", 8), ("abc", 8), ("abc", 3)).toDF("t", "k")
    def run(): Seq[Option[Long]] =
      df.selectExpr("rolling_minhash(t, k)").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val codegen = run()
    assert(codegen(1).isEmpty, "length < k must be NULL")
    assert(codegen(2).contains(RollingMinHash.minHashNaive("abc".getBytes, 3)))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == codegen)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("non-(string,int) input fails at analysis with a named error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").selectExpr("rolling_minhash(a, b)").collect()
    }
    assert(e.getMessage.contains("rolling_minhash"))
  }
}
