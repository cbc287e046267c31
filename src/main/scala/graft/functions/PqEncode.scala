package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_encode(vec ARRAY<DOUBLE>, codebook ARRAY<ARRAY<ARRAY<DOUBLE>>>) ->
  * ARRAY<INT>`: the product-quantization encode kernel as a NATIVE
  * codegen'd expression — for each of the codebook's m subspaces, the
  * index of the nearest centroid to the vector's corresponding slice
  * (squared euclidean, lowest index wins ties).
  *
  * This is q134's linear-scale hot loop: the HOF formulation
  * (transform→aggregate argmin over ksub centroids) is interpreted —
  * per row it allocates a zipped array per centroid per subspace, which
  * at 100 TB corpus scale is the encode bottleneck. Here the codebook
  * (required foldable) is converted ONCE per plan to a primitive
  * `double[][][]` shipped via the codegen references array, and encode is
  * a tight triple loop with zero per-row allocation beyond the m-int
  * result. Bit-identical to the HOF chain (same left-to-right distance
  * accumulation, same strict-< argmin) — PqEncodeSpec asserts parity.
  */
case class PqEncodeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
      if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      TypeCheckResult.TypeCheckFailure("pq_encode codebook must be foldable (a literal)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<DOUBLE> and ARRAY<ARRAY<ARRAY<DOUBLE>>>, " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  /** The foldable codebook, converted AND shape-validated once per plan
    * instance (serialized with the expression to executors). Null nested
    * elements become empty arrays, which `validated` rejects — a malformed
    * codebook yields `null` here, so every row degrades to a NULL result
    * without re-running the shape check per row. */
  @transient private lazy val codebook: Array[Array[Array[Double]]] = PqEncodeExpr.validated {
    val cb = right.eval(null).asInstanceOf[ArrayData]
    if (cb == null) Array.empty
    else Array.tabulate(cb.numElements()) { j =>
      val sub = cb.getArray(j)
      if (sub == null) Array.empty[Array[Double]]
      else Array.tabulate(sub.numElements()) { c =>
        val cent = sub.getArray(c)
        if (cent == null) Array.empty[Double] else cent.toDoubleArray()
      }
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    PqEncodeExpr.encode(l.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PqEncodeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // The converted primitive codebook rides the references array; the
    // literal child's own (cheap) codegen output is ignored.
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"""
         |${ev.value} = $helper.encode($a, $cbRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

object PqEncodeExpr {
  /** One-time shape check for a converted codebook: non-empty, no empty
    * subspace, every centroid the uniform sub-dimension. Returns the
    * codebook itself when well-formed, null otherwise — hoisted out of the
    * per-row kernel (r9) so `encode` amortizes the O(Σ|centroids|) check
    * to once per plan instead of once per row. */
  def validated(cb: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] = {
    if (cb == null || cb.length == 0 || cb(0).length == 0) return null
    val sub = cb(0)(0).length
    if (sub == 0) return null
    var j = 0
    while (j < cb.length) {
      val cents = cb(j)
      if (cents.length == 0) return null
      var c = 0
      while (c < cents.length) {
        if (cents(c).length != sub) return null
        c += 1
      }
      j += 1
    }
    cb
  }

  /** Nearest-centroid codes for every subspace — also invoked from
    * generated code. Returns null on dim mismatch, null elements (the
    * HOF chain's null semantics), a malformed (`validated`-rejected, i.e.
    * null) codebook, or all-NaN distances (argmin never taken): `pq_encode`
    * is registered as a general SQL function, so each of these must yield
    * null rather than throw / emit -1 into a containsNull=false array.
    * The codebook passed here must be `validated` output — the shape check
    * runs once per plan, not per row. */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    if (cb == null) return null
    val m = cb.length
    val sub = cb(0)(0).length
    val n = vec.numElements()
    if (n != m * sub) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val cents = cb(j)
      var best = Double.PositiveInfinity
      var bestC = -1
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = vec.getDouble(off + t) - cent(t)
          d += diff * diff
          t += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      if (bestC < 0) return null
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }
}
