package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every [[SparkEntry.queries]] entry reads through here so the scan
  * options stay in one place. Tables are plain parquet files, one per
  * table, at `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
      // Spark refuses by default (PARQUET_TYPE_ILLEGAL). Read the nanos as
      // a long and rebuild a µs-precision timestamp (truncation — matches
      // DuckDB's epoch_us on its native TIMESTAMP_NS read).
      // The nanosAsLong flag is also pinned at session creation in every
      // main and in TestSpark, so read behavior never depends on whether
      // an events query ran first; this set() covers externally-built
      // sessions.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
