package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY §2.5 note): approximate variants of the
  * exact aggregates, for the 100 TB path where exact count-distinct's
  * shuffle is the bottleneck. No oracle queries — DuckDB's HLL differs by
  * construction — so the gate is error-bound assertions vs the exact
  * answers.
  */
class ApproxSpec extends SparkSpec {

  private lazy val lineitem = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet").cache()

  test("approx_count_distinct within 5% of exact") {
    val exact = lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = lineitem.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .head().getLong(0)
    math.abs(approx - exact).toDouble / exact should be < 0.05
  }

  test("approx percentile brackets the exact median") {
    val exact = lineitem.stat.approxQuantile("l_quantity", Array(0.5), 0.0).head
    val approx = lineitem
      .select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // exact quantile of integers 1..50: approx must land within 1 step
    math.abs(approx - exact) should be <= 1.0
  }

  test("sketches aggregate partially (single shuffle, no global collect)") {
    val plan = lineitem.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")))
      .queryExecution.executedPlan.toString
    plan should include("HashAggregate")
    // partial + final pair around one Exchange
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }
}
