package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared DataFrame plumbing used across operator modules. */
object Frames {

  /** Round-robin the frame across all cores. Small parquet files arrive
    * as ONE scan partition (file < maxPartitionBytes), which would run
    * CPU-heavy downstream stages single-threaded; one tiny shuffle
    * parallelizes them.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Cache only if the caller has not already done so (double-caching
    * logs "already cached" warnings and double-registers the plan).
    */
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df

  /** Eagerly materialize a frame and truncate its lineage — the barrier
    * iterative operators ([[graft.dedup.Dedup.components]],
    * [[graft.ops.Prefix.runningTotal]]) place between rounds/branches.
    *
    * Default is `localCheckpoint(eager = true)`: executor-local blocks,
    * no checkpoint directory needed — right for the local harness and for
    * short-lived intermediates. At cluster scale that trades away fault
    * tolerance (an executor loss after the checkpoint fails the job
    * because the blocks have no lineage to recompute from) and pins
    * executor storage until the session drops the RDD. Set the session
    * conf `graft.checkpoint.reliable=true` (plus
    * `sparkContext.setCheckpointDir` on durable storage) to route these
    * barriers through reliable `checkpoint(true)` instead — survivable
    * and storage-bounded, at the cost of a distributed-FS round trip per
    * barrier.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("graft.checkpoint.reliable", "false").toBoolean)
      df.checkpoint(true)
    else df.localCheckpoint(true)
}
