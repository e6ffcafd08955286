package graft

import org.apache.spark.sql.SparkSession

/** Minimal smoke runner mirroring the driver's t1 check: `entry` must
  * return rows > 0 on sf0.001. Also prints the physical plan so scan
  * pushdown / broadcast choices are visible during development.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    rows.take(10).foreach(println)
    spark.stop()
  }
}
