package graft

import org.apache.spark.sql.functions._

import graft.ops.Bootstrap

/** Round-5 evaluation operators: Poisson bootstrap. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("Bootstrap CDF thresholds are the Poisson(1) CDF") {
    val t = Bootstrap.CdfThresholds
    t.size shouldBe 7
    t.head shouldBe math.exp(-1.0) +- 1e-15
    t(1) shouldBe 2 * math.exp(-1.0) +- 1e-15
    t.last should be > 0.9999
    t shouldBe t.sorted
  }

  test("Bootstrap weights are deterministic and mean ~1") {
    val df = (1 to 2000).map(i => (i.toString, 1.0)).toDF("rk", "x")
    val w1 = df.select(Bootstrap.weight(col("rk"), lit(0)).as("w"))
      .agg(sum(col("w")), avg(col("w"))).head()
    val w2 = df.select(Bootstrap.weight(col("rk"), lit(0)).as("w"))
      .agg(sum(col("w")), avg(col("w"))).head()
    w1.getLong(0) shouldBe w2.getLong(0) // same seed -> identical weights
    // Poisson(1) mean is 1; 2000 draws -> SE ~ 1/sqrt(2000) ~ 0.022
    w1.getDouble(1) shouldBe 1.0 +- 0.1
  }

  test("replicate means straddle the true mean and vary by replicate") {
    val df = (1 to 500).map(i => (i.toString, i.toDouble)).toDF("rk", "x")
    val means = Bootstrap.replicateMeans(df, col("rk"), col("x"), 50)
      .collect().map(_.getDouble(1))
    means.length shouldBe 50
    means.distinct.length should be > 1 // different replicates differ
    // true mean 250.5; bootstrap means concentrate around it
    val avg = means.sum / means.length
    avg shouldBe 250.5 +- 25.0
  }
}
