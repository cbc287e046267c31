package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncating eager materialization with a cluster-durability
  * switch (r10 verdict item 7 — previously prose in SURVEY §2.4, now
  * code): `localCheckpoint` stores blocks on the executors that computed
  * them (MEMORY_AND_DISK, GC-managed) — fast, but an executor loss kills
  * lineage-truncated blocks unrecoverably, so on a real cluster a long
  * job wants `checkpoint()` into a cluster-visible directory (HDFS/S3)
  * instead. The switch is the session's own checkpoint configuration:
  * callers that `setCheckpointDir(...)` get durable checkpoints, local
  * runs (tests, the bench) keep the fast path. Both are EAGER, so the
  * two-readers-one-materialization contracts (DistributedRank's single
  * range-boundary sample, WeightedPaths' computed-once Pregel result)
  * hold identically in either mode.
  */
object Checkpointing {

  /** Which mode [[stable]] will pick for this session. */
  def mode(df: DataFrame): String =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) "reliable"
    else "local"

  /** Eagerly materialize `df` with truncated lineage: reliable
    * `checkpoint()` when the SparkContext has a checkpoint dir
    * configured, `localCheckpoint()` otherwise. */
  def stable(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
