package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared exact-top-k / probe-set / tie-robust-recall plumbing for the
  * recall tools (r13 verdict item 6): RecallGate and IvfFrontier each
  * carried their own copy of these definitions, so the two notions of
  * "tie-robust recall@k" could silently drift. There is exactly ONE
  * definition now; both tools (and RecallGateSpec through RecallGate.run)
  * compile against it.
  *
  * All helpers operate on a derived copy-structured fixture
  * (`tools/derive_scale.py` — id-shifted copies at +100000·i offsets), and
  * every collect here is bounded: top-k lists, probe-id score maps, and
  * the distinct copy-offset list (≤ copy factor).
  */
object RecallCommon {

  /** The derive_scale.py vec_id copy offset (id-shifted exact duplicates). */
  val CopyOffset = 100000L

  /** The embeddings corpus as (vec_id, arr DOUBLE[]) — the exact-scoring
    * representation every recall computation runs against. */
  def vecBase(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("arr"))

  /** Probe ids spanning distinct copies of the derived fixture: two
    * base-copy probes plus one per later copy (up to two). */
  def copyProbes(spark: SparkSession, base0: DataFrame): Seq[Long] = {
    import spark.implicits._
    // bounded-collect: one row per derive_scale copy (≤ the copy factor)
    val copyOffsets = base0.select((col("vec_id") / CopyOffset).cast("long"))
      .distinct().as[Long].collect().sorted
    Seq(0L, 117L) ++ copyOffsets.drop(1).take(2).map(_ * CopyOffset + 117L)
  }

  /** `base0` with probe `p`'s vector as a literal `pvec` column (the form
    * the metric expressions `array_dot(arr, pvec)` score against), plus
    * the raw probe vector. */
  def withProbe(base0: DataFrame, p: Long): (DataFrame, Seq[Double]) = {
    val probe = base0.filter(col("vec_id") === p).head().getSeq[Double](1)
    (base0.withColumn("pvec", typedLit(probe)), probe)
  }

  /** (top-k ids, tie-robust k-th score) for `metricCol` over the corpus. */
  def exactTop(base: DataFrame, metricCol: Column, probeId: Long, k: Int)
      : (Set[Long], Double) = {
    // bounded-collect: exactly k rows
    val top = base.filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), metricCol.as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    (top.map(_._1).toSet, top.map(_._2).min)
  }

  /** Tie-robust recall@k: fraction of returned ids whose exact score ties
    * or beats the exact k-th score (1e-9 slack for engine-side rounding).
    * Tie-robustness matters on copy fixtures: every vector has exact
    * duplicates, so WHICH of ten identical copies an index returns must
    * not be graded as a miss. */
  def recallOf(base: DataFrame, metricCol: Column, probeId: Long, k: Int,
      returned: Seq[Long]): Double = {
    val (_, kth) = exactTop(base, metricCol, probeId, k)
    if (returned.isEmpty) 0.0
    else {
      // bounded-collect: one row per returned candidate (≤ k)
      val scores = base.filter(col("vec_id").isin(returned.map(Long.box): _*))
        .select(col("vec_id"), metricCol.as("score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      returned.count(id => scores.getOrElse(id, Double.NegativeInfinity) >= kth - 1e-9)
        .toDouble / k
    }
  }
}
