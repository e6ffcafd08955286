package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedAvg aggregator: typed groupBy partial+final aggregation") {
    val ds = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "v", "w").as[(String, Double, Double)]
    val wavg = Aggregators.WeightedAvg.toColumn
    val out = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(wavg.name("wavg"))
      .collect().toMap
    out("a") shouldBe (10.0 * 1 + 20.0 * 3) / 4.0
    out("b") shouldBe 5.0
  }

  test("WeightedAvg over zero weight yields NaN, and merge is associative") {
    val z = Aggregators.WeightedAvg.zero
    Aggregators.WeightedAvg.finish(z).isNaN shouldBe true
    val r1 = Aggregators.WeightedAvg.reduce(z, (4.0, 2.0))
    val r2 = Aggregators.WeightedAvg.reduce(z, (6.0, 1.0))
    Aggregators.WeightedAvg.merge(r1, r2) shouldBe
      Aggregators.WeightedAvg.merge(r2, r1)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    d shouldBe 11.0
  }

  test("GraftExtensions injects the same functions via the extensions hook") {
    // the injection point itself (sessions created with
    // spark.sql.extensions=graft.GraftExtensions): apply must register
    // without error on a fresh extensions container
    noException should be thrownBy new GraftExtensions()(new SparkSessionExtensions)
  }
}
