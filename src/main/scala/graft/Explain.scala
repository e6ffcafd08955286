package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time of one
  * registered query. Usage: Explain <queryName> <sfDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"rows=$n time=$sec%.2fs")
    spark.stop()
  }
}
