package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fnv1a64(string|binary) -> bigint`: FNV-1a 64-bit hash as a NATIVE
  * Catalyst expression with whole-stage codegen — the preferred shape for
  * a custom scalar (survey §4.2: a codegen'd `Expression` beats a Scala
  * UDF beats anything else). Used as the cheap content-fingerprint
  * primitive for dedup/bucketing where md5's 128 bits and string output
  * are overkill.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fnv1a64 requires STRING or BINARY input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Fnv1a64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasher = Fnv1a64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$hasher.hash($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$hasher.hash($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)

  override def prettyName: String = "fnv1a64"
}

object Fnv1a64 {
  /** Reference implementation — also invoked from generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Session extensions: registers the engine's native functions so plain
  * `spark.sql("SELECT fnv1a64(x) ...")` and `expr("fnv1a64(x)")` resolve
  * like built-ins. Wired in [[graft.Sessions.local]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "fnv1a64 takes exactly one argument")
        Fnv1a64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_dot takes exactly two arguments")
        ArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_minhash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "rolling_minhash takes exactly two arguments")
        RollingMinHash(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "pq_encode takes exactly two arguments")
        PqEncodeExpr(children.head, children(1))
      }))
    // Spark's runtime-filter bloom pair (catalyst-internal, not in the
    // session registry), surfaced as session functions so a decontamination
    // pipeline can build/probe a distributed bloom filter entirely in-plan:
    // `graft_bloom_agg(xxhash64(k)[, n_items])` aggregates a binary sketch
    // (partial-merged like any TypedImperativeAggregate — no driver build),
    // `graft_might_contain(bloom, xxhash64(k))` probes it with codegen.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg takes one or two arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_might_contain takes exactly two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
