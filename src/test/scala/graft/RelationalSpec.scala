package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup keeps exactly k best rows per group, deterministically") {
    val df = Seq(
      ("g1", "a", 10), ("g1", "b", 30), ("g1", "c", 20), ("g1", "d", 30),
      ("g2", "e", 5)).toDF("g", "id", "v")
    val out = topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), k = 2)
      .orderBy("g", "rank").collect()
    out.map(r => (r.getString(0), r.getString(1), r.getInt(3))) shouldBe
      Array(("g1", "b", 1), ("g1", "d", 2), ("g2", "e", 1))
  }

  test("yoyJoin and yoyLag agree on the diff column") {
    val byYear = Seq((2016, 10.0), (2017, 12.5), (2018, 11.0), (2020, 9.0))
      .toDF("year", "total")
    val j = yoyJoin(byYear, "year", "total")
      .select("year", "total_diff").as[(Int, Double)].collect().toMap
    // lag-based variant includes years without a predecessor (null diff) and
    // treats 2020 as following 2018 (sequence-lag, not year-arithmetic):
    // compare only on consecutive-year keys, where semantics coincide.
    val l = yoyLag(byYear, "year", "total")
      .select("year", "total_diff")
      .where($"total_diff".isNotNull)
      .as[(Int, Double)].collect().toMap
    j.keySet shouldBe Set(2017, 2018)
    j(2017) shouldBe 2.5
    j(2018) shouldBe -1.5
    l(2017) shouldBe 2.5
    l(2018) shouldBe -1.5
    j.foreach { case (y, d) => l(y) shouldBe d }
  }

  test("decade derives the reference's UDF result natively") {
    val out = Seq(1960, 1999, 2000, 2023).toDF("year")
      .select(decade($"year").as("d")).as[String].collect()
    out shouldBe Array("1960s", "1990s", "2000s", "2020s")
  }

  test("dsum is exact and order-independent") {
    // 0.1 added 1000 times: IEEE double accumulation drifts; decimal doesn't.
    val df = Seq.fill(1000)(0.1).toDF("x")
    val total = df.select(dsum($"x", 4).as("s")).as[Double].head()
    total shouldBe 100.0
    val repart = df.repartition(7).select(dsum($"x", 4).as("s")).as[Double].head()
    repart shouldBe total
  }

  test("denormalize broadcasts dimensions (no shuffle of the fact side)") {
    val fact = Seq((1, 100.0), (2, 50.0)).toDF("k", "v")
    val dim = Seq((1, "one"), (2, "two")).toDF("dk", "name")
    val out = denormalize(fact, Seq((dim, col("k") === col("dk"))))
    out.count() shouldBe 2
    val plan = out.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }
}
