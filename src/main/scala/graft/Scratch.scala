package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q54_components", "q55_tfidf_keywords")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    try io.Writers.noop(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      io.Writers.noop(SparkEntry.queries(name)(spark, sfDir))
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
