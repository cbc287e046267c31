package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator`) computing an exact decimal-free sum of
  * squares with a (sum, count) buffer — the operator-row-41 competency:
  * partial aggregation (`reduce`) on the map side, `merge` across
  * partitions, one value out. Registered per-query via
  * `functions.udaf(SumSquares)`. */
object SumSquares extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + x * x, b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double = b._1
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
