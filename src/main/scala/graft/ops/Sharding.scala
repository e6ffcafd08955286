package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Md5Long

/** Consistent-hash shard assignment (Karger et al., STOC'97): shards own
  * ring positions through virtual nodes; a key belongs to the first
  * vnode clockwise from its own ring position. Growing the cluster
  * N → N+1 then relocates only the keys the new shard's vnodes capture
  * (≈ 1/(N+1) of the data), where modulo sharding relocates ≈ N/(N+1) —
  * the difference between topping up a 100 TB cluster overnight and
  * re-shuffling all of it.
  *
  * Scale shape: the ring is nShards×vnodes rows (model-sized,
  * broadcast); assignment is one narrow projection plus a broadcast
  * join — the keys never shuffle. Positions are 48-bit md5 prefixes
  * ([[Md5Long]]), replayable in the DuckDB oracle.
  */
object Sharding {

  /** The ring: one row per virtual node, `(shard, vpos)` with
    * vpos = 48-bit md5 of "s<shard>:v<vnode>".
    */
  def ring(spark: SparkSession, nShards: Int, vnodes: Int): DataFrame = {
    import spark.implicits._
    (for { s <- 0 until nShards; v <- 0 until vnodes } yield (s, v))
      .toDF("shard", "v")
      .select(col("shard"), Md5Long.md5PrefixLong(
        concat(lit("s"), col("shard").cast("string"),
          lit(":v"), col("v").cast("string")), 0, 6).as("vpos"))
  }

  /** `(key, shard)` under the ring: the vnode with the smallest position
    * at or after the key's position, wrapping to the globally smallest
    * vnode. Tie-broken by min shard (48-bit position collisions).
    *
    * Output contract: ONE ROW PER DISTINCT KEY — assignment is a
    * function of the key, so duplicate input keys are collapsed by the
    * final aggregation (a mapping table, not a row-wise transform; join
    * the result back to the data to route rows). The crossJoin fan-out
    * is against the broadcast MODEL-SIZED ring (nShards·vnodes rows),
    * never data×data.
    */
  def ringAssign(keys: DataFrame, keyCol: Column, nShards: Int,
                 vnodes: Int): DataFrame = {
    val r = ring(keys.sparkSession, nShards, vnodes)
    val k = keys.select(keyCol.as("key"),
      Md5Long.md5PrefixLong(keyCol.cast("string"), 0, 6).as("kpos"))
    k.crossJoin(broadcast(r))
      .groupBy("key", "kpos")
      .agg(min(when(col("vpos") >= col("kpos"), col("vpos"))).as("ge"),
        min(col("vpos")).as("mn"))
      .withColumn("tpos", coalesce(col("ge"), col("mn")))
      .join(broadcast(r), col("tpos") === col("vpos"))
      .groupBy("key").agg(min(col("shard")).as("shard"))
  }
}
