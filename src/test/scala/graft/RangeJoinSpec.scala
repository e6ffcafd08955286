package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta join, without a nested-loop plan") {
    val points = (1 to 500).map(i => (i.toLong, i.toLong * 7 % 1000))
      .toDF("pid", "p")
    val intervals = (1 to 100).map { i =>
      val s = (i * 13L) % 900; (i.toLong, s, s + (i % 50))
    }.toDF("iid", "s", "e")

    val banded = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      bandWidth = 32)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"p" >= $"s" && $"p" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    banded shouldBe naive

    val plan = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 32)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("boundary inclusivity: start and end both match") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "p")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val hits = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 5)
      .select("pid").as[Long].collect().toSet
    hits shouldBe Set(1L, 2L)
  }

  test("intervalOverlap equals the naive theta join, each pair exactly once") {
    // keyed intervals with lengths straddling the band width, including
    // touch-at-boundary and containment cases
    val a = (1 to 200).map { i =>
      val s = (i * 17L) % 500; (i % 5L, i.toLong, s, s + i % 60)
    }.toDF("k", "aid", "a_s", "a_e")
    val b = (1 to 200).map { i =>
      val s = (i * 29L) % 500; (i % 5L, i.toLong, s, s + i % 40)
    }.toDF("k", "bid", "b_s", "b_e")

    val banded = RangeJoin.intervalOverlap(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", bandWidth = 32)
      .select("aid", "bid")
    // exactly once: collect as a LIST and compare to the naive pair SET
    val got = banded.as[(Long, Long)].collect().toSeq
    val naive = a.join(b, Seq("k"))
      .where($"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    got.toSet shouldBe naive
    got.size shouldBe naive.size // first-band dedup left no duplicates

    val plan = RangeJoin.intervalOverlap(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", 32)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("intervalOverlap touch-at-endpoint counts as overlap (closed intervals)") {
    val a = Seq((1L, 1L, 0L, 10L)).toDF("k", "aid", "a_s", "a_e")
    val b = Seq((1L, 1L, 10L, 20L), (1L, 2L, 11L, 20L)).toDF("k", "bid", "b_s", "b_e")
    val hits = RangeJoin.intervalOverlap(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", 4)
      .select("bid").as[Long].collect().toSet
    hits shouldBe Set(1L)
  }
}
