package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at or before each left time, per key") {
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "t", "px")
    val trades = Seq( // (sym, t, qty)
      ("A", 5L, 100L),   // before any quote -> null
      ("A", 20L, 200L),  // exactly at quote 2.0 -> inclusive match
      ("A", 25L, 300L),  // between -> 2.0
      ("A", 99L, 400L),  // after all -> 3.0
      ("B", 14L, 500L),  // before B's quote -> null
      ("C", 50L, 600L)). // key with no right rows -> null
      toDF("sym", "t", "qty")

    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select("sym", "qty", "px").collect()
      .map(r => r.getLong(1) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    out(100L) shouldBe None
    out(200L) shouldBe Some(2.0)
    out(300L) shouldBe Some(2.0)
    out(400L) shouldBe Some(3.0)
    out(500L) shouldBe None
    out(600L) shouldBe None
  }

  test("asOf preserves every left row and all left columns") {
    val left = Seq(("A", 1L, "x"), ("A", 2L, "y")).toDF("k", "t", "extra")
    val right = Seq(("A", 1L, 7.7)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    out.count() shouldBe 2
    out.columns.toSet shouldBe Set("k", "t", "extra", "v")
  }

  test("payload name collision fails fast") {
    val l = Seq(("A", 1L, 5.0)).toDF("k", "t", "v")
    val r = Seq(("A", 1L, 6.0)).toDF("k", "t", "v")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
  }

  test("plan shape: one shuffle on the keys, no cross/range explosion") {
    val left = (1 to 100).map(i => ("k" + i % 3, i.toLong, i)).toDF("k", "t", "x")
    val right = (1 to 50).map(i => ("k" + i % 3, i.toLong * 2, i * 1.0)).toDF("k", "t", "p")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("p"))
    val plan = out.queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
