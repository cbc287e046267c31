package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank without a single-task global sort — the distributed
  * form of `row_number() OVER (ORDER BY …)` for inputs too large for one
  * task (the q116 lesson: three global ntile windows over a
  * hundreds-of-millions-row customer dim serialize on one executor).
  *
  * Shape: range-repartition on the sort key (each shuffle partition owns
  * a contiguous key range), sort within partitions in parallel, read the
  * local row index off monotonically_increasing_id (partitionId·2^33 +
  * local index, evaluated as rows stream out of the per-partition sort),
  * then rebase with a partition-grain offset table — one row per shuffle
  * partition, the only unpartitioned window here, bounded by the
  * partition count — broadcast back. Global rank = partition offset +
  * local index + 1.
  *
  * Correctness hinges on BOTH branches (ranked rows, per-partition
  * counts) reading the SAME physical range partitioning: range
  * boundaries are sampled per exchange instance, so two independent
  * exchanges can draw different bounds and mis-count. Catalyst's
  * ReuseExchange does NOT guarantee this here — column pruning
  * specializes the offsets branch (it only needs the partition id) so
  * the two exchange subtrees are not identical and reuse does not fire.
  * The frame is therefore materialized exactly once with an eager
  * localCheckpoint (the q97 static-side pattern; MEMORY_AND_DISK,
  * GC-managed, spill-safe) and both branches read the frozen
  * partitions. DistributedRankSpec proves rank == row_number on
  * shuffled payload-carrying fixtures across partition counts and AQE
  * settings — the shape that silently mis-ranked before this fix.
  * Ranks are otherwise independent of where the sampled boundaries
  * land, because the caller must pass a TOTAL order (unique tie-break
  * column).
  */
object DistributedRank {

  /** Adds 1-based column `out` = exact global rank along `sort`, which
    * must be a total order (include a unique tie-break column). */
  def withGlobalRank(df: DataFrame, out: String, sort: Column*): DataFrame = {
    val pid = out + "_pid"
    val mid = out + "_mid"
    val n = out + "_n"
    val off = out + "_off"
    // Eagerly materialized: mid/pid are frozen at checkpoint time, so
    // the offsets branch below counts the exact partitions the ranked
    // branch reads — one range-boundary sample, not two. Durability
    // follows the session's checkpoint config (graft.Checkpointing):
    // local blocks here, reliable checkpoint when a cluster dir is set.
    val sorted = graft.Checkpointing.stable(df
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn(mid, monotonically_increasing_id())
      .withColumn(pid, spark_partition_id().cast("long")))
    val offW = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(pid).agg(count(lit(1)).as(n))
      .withColumn(off, coalesce(sum(n).over(offW), lit(0L)))
      .select(col(pid), col(off))
    sorted.join(broadcast(offsets), pid)
      .withColumn(out, col(off) + (col(mid) - shiftleft(col(pid), 33)) + 1L)
      .drop(mid, pid, off)
  }
}
