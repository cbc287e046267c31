package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_minhash(text, k) -> bigint`: the minimum polynomial
  * (Rabin–Karp) hash over all k-byte windows of `text` — the winnowing-
  * style document fingerprint used for near-dup detection and content-
  * defined chunking in training-data pipelines.
  *
  * Hash of one window: `h = fold(acc * 31 + byte) mod 1e9+7`. The whole
  * column is computed in ONE O(n) pass per document via the rolling
  * recurrence `h' = (h - c_out * 31^(k-1)) * 31 + c_in  (mod p)` — not the
  * O(n·k) rehash-every-window form (which is what the DuckDB oracle and
  * the HOF-chain parity test use, with identical arithmetic on ASCII
  * input). NULL when the document is shorter than k bytes.
  *
  * Native Catalyst expression with whole-stage codegen (survey §4.2
  * preference order) — the per-window loop never leaves generated code.
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_minhash requires (STRING, INT), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(text: Any, k: Any): Any = {
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val kk = k.asInstanceOf[Int]
    if (kk <= 0 || bytes.length < kk) null
    else RollingMinHash.minHash(bytes, kk)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, k) => {
      val b = ctx.freshName("bytes")
      s"""
         |byte[] $b = $t.getBytes();
         |if ($k <= 0 || $b.length < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $helper.minHash($b, $k);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingMinHash =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rolling_minhash"
}

object RollingMinHash {
  final val Mod = 1000000007L
  final val Base = 31L

  /** Min k-window polynomial hash in one rolling pass. Requires
    * `0 < k <= bytes.length` (callers gate). Also invoked from generated
    * code. */
  def minHash(bytes: Array[Byte], k: Int): Long = {
    // 31^(k-1) mod p, for the roll-out term.
    var pow = 1L
    var i = 1
    while (i < k) { pow = (pow * Base) % Mod; i += 1 }
    // First window.
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xffL)) % Mod; i += 1 }
    var min = h
    // Roll: every value stays well under 2^63 (h < p ~ 2^30, pow < p).
    i = k
    while (i < bytes.length) {
      val out = (bytes(i - k) & 0xffL) * pow % Mod
      h = ((h - out + Mod) * Base + (bytes(i) & 0xffL)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** O(n·k) reference: rehash every window independently (the oracle
    * shape). Used by the parity spec. */
  def minHashNaive(bytes: Array[Byte], k: Int): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i + k <= bytes.length) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * Base + (bytes(i + j) & 0xffL)) % Mod; j += 1 }
      if (h < min) min = h
      i += 1
    }
    min
  }
}
