package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.versioned.VersionedTable

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave produces the Morton code") {
    // x=0b101, y=0b011 -> bits (x0,y0,x1,y1,x2,y2) = 1,1,0,1,1,0 -> 0b011011 = 27
    val df = Seq((5, 3)).toDF("x", "y")
    val z = df.select(ZOrder.interleave(Seq($"x", $"y"), 3).as("z"))
      .as[Long].head()
    z shouldBe 27L
  }

  test("BucketOf: equi-depth buckets in both eval paths, nulls to bucket 0") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val key = org.apache.spark.sql.GraftSqlBridge.column(
      ZOrder.BucketOf(
        org.apache.spark.sql.GraftSqlBridge.expression($"v"),
        Array(25.0, 50.0, 75.0)))
    val buckets = df.select($"v", key.as("b")).as[(Double, Int)].collect().toMap
    buckets(10.0) shouldBe 0
    buckets(25.0) shouldBe 1 // boundary is inclusive-left
    buckets(60.0) shouldBe 2
    buckets(99.0) shouldBe 3
  }

  test("zorderKey distributes skewed data into distinct keys") {
    // heavily skewed x: quantile buckets still split it (uniform buckets wouldn't)
    val df = ((1 to 90).map(_ => 1.0) ++ Seq(2.0, 3.0, 1000.0))
      .zipWithIndex.map { case (x, i) => (x, i.toDouble) }.toDF("x", "y")
    val keys = df.select(ZOrder.zorderKey(df, Seq("x", "y"), bits = 4).as("z"))
      .distinct().count()
    keys should be > 10L
  }

  test("VersionedTable.zorder clusters both columns: per-file ranges are narrow") {
    val n = 1024
    val df = (0 until n).map { i => (i % 32, i / 32) }.toDF("x", "y")
      .select($"x".cast("double").as("x"), $"y".cast("double").as("y"))
    val t = VersionedTable.create(spark, tmpDir("zo"), df.repartition(8))
    t.zorder(numFiles = 16, cols = Seq("x", "y"), bits = 5)
    t.toDF.count() shouldBe n
    t.history.head().getString(1) shouldBe "ZORDER(x,y)"
    // each output file should span a narrow range of BOTH x and y — the
    // point of z-order vs range-sort (which would leave y unclustered).
    val spans = t.toDF
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .select(avg($"dx" + $"dy")).as[Double].head()
    // random placement would give avg dx+dy ≈ 31+31 = 62; z-order gets well under half
    spans should be < 31.0
  }
}
