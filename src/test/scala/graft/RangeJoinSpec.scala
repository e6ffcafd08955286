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
}
