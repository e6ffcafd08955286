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
}
