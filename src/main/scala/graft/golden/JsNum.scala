package graft.golden

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** ECMAScript `Number#toString` formatting for doubles — the reference
  * writes its output with JS default number formatting
  * (`/root/reference/src/main.js:41,99`), so golden byte-equality needs
  * the same rendering:
  *  - integer-valued doubles print with no decimal point (`1`, not `1.0`);
  *  - otherwise the SHORTEST decimal digit string that round-trips to the
  *    same double (JDK 17's `Double.toString` is not always shortest);
  *  - plain (non-exponent) notation in the 1e-6..1e21 range, which covers
  *    every value the pipeline emits (CC ∈ [0,1], percentages, counts).
  */
object JsNum {
  def format(x: Double): String = {
    if (x.isNaN) return "NaN"
    if (x.isInfinite) return if (x > 0) "Infinity" else "-Infinity"
    if (x == 0.0) return "0"
    if (x == Math.rint(x) && Math.abs(x) < 1e21)
      return new JBigDecimal(x).setScale(0, RoundingMode.UNNECESSARY).toBigInteger.toString
    var p = 1
    while (p <= 17) {
      val bd = new JBigDecimal(x, new MathContext(p, RoundingMode.HALF_EVEN))
      if (bd.doubleValue == x) return bd.stripTrailingZeros.toPlainString
      p += 1
    }
    java.lang.Double.toString(x)
  }
}
