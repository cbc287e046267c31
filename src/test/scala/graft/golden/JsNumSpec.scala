package graft.golden

import org.scalatest.funsuite.AnyFunSuite

class JsNumSpec extends AnyFunSuite {
  test("integer-valued doubles print without decimal point (JS semantics)") {
    assert(JsNum.format(1.0) == "1")
    assert(JsNum.format(0.0) == "0")
    assert(JsNum.format(100.0) == "100")
    assert(JsNum.format(2852.0) == "2852")
  }

  test("golden values from the reference outputs render byte-exact") {
    // output/0.proofs:4 and output/0.metrics values
    assert(JsNum.format(64.0 / 153.0 * 100) == "41.830065359477125")
    assert(JsNum.format(2920.0 / 8378.0 * 100) == "34.85318691811889")
    assert(JsNum.format(14.0 / 15.0) == "0.9333333333333333")
    assert(JsNum.format(8.0 / 9.0) == "0.8888888888888888")
    assert(JsNum.format(0.4) == "0.4")
  }

  test("shortest round-trip: format re-parses to the identical double") {
    val xs = Seq(0.1, 1.0 / 3.0, 2.0 / 3.0, 0.42081949058693247, 1e-6,
      123456.789, 0.30000000000000004)
    xs.foreach(x => assert(JsNum.format(x).toDouble == x, s"round-trip $x"))
  }
}
