package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Prefix, Sampling}

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 500L).map(i => (i, (i * 7919) % 97 + 1)) // sizes 1..97
    .toDF("id", "size")

  test("runningTotal equals the naive global window") {
    val naive = rows.withColumn("cum",
      sum($"size").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Prefix.runningTotal(rows, Seq($"id"), $"size", "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe naive
  }

  test("runningTotal is partitioning-independent") {
    val a = Prefix.runningTotal(rows, Seq($"id"), $"size", "cum")
      .select("id", "cum").collect().toSet
    val b = Prefix.runningTotal(rows.repartition(13), Seq($"id"), $"size", "cum")
      .select("id", "cum").collect().toSet
    a shouldBe b
  }

  test("runningTotal plans no unpartitioned window: offsets come from a predecessor join") {
    // The data-sized local window (partitioned by __pid) sits behind the
    // materialize barrier; the visible plan must carry NO window at all —
    // the offsets prefix is the left-outer predecessor self-join. Any
    // windowspecdefinition here would mean the single-partition trap came
    // back.
    val plan = Prefix.runningTotal(rows, Seq($"id"), $"size", "cum")
      .queryExecution.optimizedPlan.toString
    plan should not include "windowspecdefinition"
    plan should include("LeftOuter")
    plan should include("__ppid")
  }

  test("runningMax equals the naive global window on out-of-order values") {
    // values jump around so local maxima differ per range partition
    val vals = (1L to 500L).map(i => (i, (i * 6007) % 991)).toDF("id", "v")
    val naive = vals.withColumn("m",
      max($"v").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Prefix.runningMax(vals, Seq($"id"), $"v", "m")
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe naive
    // and the visible plan carries no window — offsets are the
    // predecessor self-join (see the runningTotal plan test)
    val plan = Prefix.runningMax(vals, Seq($"id"), $"v", "m")
      .queryExecution.optimizedPlan.toString
    plan should not include "windowspecdefinition"
  }

  test("runningMin equals the naive global window; desc order gives suffix minima") {
    val vals = (1L to 400L).map(i => (i, (i * 6007) % 991)).toDF("id", "v")
    val naive = vals.withColumn("m",
      min($"v").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Prefix.runningMin(vals, Seq($"id"), $"v", "m")
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe naive
    // reversed order = "smallest value at or after this row" (backfill)
    val suffix = Prefix.runningMin(vals, Seq($"id".desc), $"v", "m")
      .select("id", "m").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = vals.collect().map(r => (r.getLong(0), r.getLong(1)))
    expect.foreach { case (id, _) =>
      suffix(id) shouldBe expect.filter(_._1 >= id).map(_._2).min
    }
  }

  test("rankTop ranks the k-shortlist by the single stated order") {
    val df = (1L to 200L).map(i => (i, (i * 37) % 101)).toDF("id", "score")
    val out = Prefix.rankTop(df, Seq($"score".desc, $"id"), k = 5, out = "rk")
      .select("id", "score", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    out.map(_._3).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    val expected = (1L to 200L).map(i => (i, (i * 37) % 101))
      .sortBy { case (id, s) => (-s, id) }.take(5)
    out.map(t => (t._1, t._2)).toSeq shouldBe expected
  }

  test("runningTotals: several series share one pass, equal to naive windows") {
    val vals = (1L to 300L).map(i => (i, i % 5, (i * 13) % 7)).toDF("id", "a", "b")
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = vals
      .withColumn("ca", sum($"a").over(w)).withColumn("cb", sum($"b").over(w))
      .select("id", "ca", "cb").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fast = Prefix.runningTotals(vals, Seq($"id"),
        Seq($"a" -> "ca", $"b" -> "cb"))
      .select("id", "ca", "cb").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    fast shouldBe naive
  }

  test("runningTotal with strata equals the naive per-stratum window") {
    val strat = rows.withColumn("grp",
      when($"id" % 3 === 0, lit("a")).when($"id" % 3 === 1, lit("b"))
        .otherwise(lit("c")))
    val naive = strat.withColumn("cum",
      sum($"size").over(Window.partitionBy($"grp").orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Prefix.runningTotal(strat, Seq($"id"), $"size", "cum",
        strataCols = Seq("grp"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe naive
  }

  test("runningTotal handles negative values (totals are sums, not running-max)") {
    val deltas = (1L to 300L).map(i => (i, if (i % 2 == 0) -3L else 5L))
      .toDF("id", "delta")
    val naive = deltas.withColumn("cum",
      sum($"delta").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Prefix.runningTotal(deltas, Seq($"id"), $"delta", "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe naive
  }

  test("runningTotal keeps rows whose stratum is NULL") {
    val strat = rows.withColumn("grp",
      when($"id" % 3 === 0, lit("a")).otherwise(lit(null: String)))
    val out = Prefix.runningTotal(strat, Seq($"id"), $"size", "cum",
      strataCols = Seq("grp"))
    out.count() shouldBe 500
    // NULL stratum accumulates independently of "a"
    val naive = strat.withColumn("cum",
      sum($"size").over(Window.partitionBy($"grp").orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap shouldBe naive
  }

  test("packShards: no shard's exclusive prefix spans a budget boundary") {
    val out = Prefix.packShards(rows, Seq($"id"), $"size", budget = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // id, cum, shard
    // Shard of each row == (cum - size-at-row) / 300 by definition; check
    // monotone non-decreasing in id order and first row in shard 0.
    val sorted = out.sortBy(_._1)
    sorted.head._3 shouldBe 0L
    sorted.sliding(2).foreach { case Array(a, b) => b._3 should be >= a._3; case _ => () }
    // Total mass / budget bounds the shard count.
    val totalMass = rows.agg(sum($"size")).head.getLong(0)
    sorted.map(_._3).max should be <= (totalMass / 300L)
  }

  test("reserved internal names are rejected loudly, not silently clobbered") {
    val df = Seq((1, 10)).toDF("k", "__local")
    an[IllegalArgumentException] should be thrownBy
      Prefix.runningTotal(df, Seq(col("k")), col("k"), "cum")
    val df2 = Seq((1, 10)).toDF("k", "__excl")
    an[IllegalArgumentException] should be thrownBy
      Prefix.packShards(df2, Seq(col("k")), col("k"), budget = 5)
  }

  test("shuffleOrder: a permutation, stable across runs, different by salt") {
    val df = rows.select("id")
    val p1 = Sampling.shuffleOrder(df, $"id", salt = "s").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p2 = Sampling.shuffleOrder(df.repartition(11), $"id", salt = "s").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    p1 shouldBe p2
    p1.values.toSeq.sorted shouldBe (1L to 500L)
    val other = Sampling.shuffleOrder(df, $"id", salt = "t").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    other should not be p1
  }
}
