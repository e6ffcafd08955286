package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKRewrite

/** The TopKRewrite optimizer rule: the declarative
  * `row_number() OVER (...) <= k` form must plan through the native
  * bounded-heap exec when (and only when) the pattern is safe to
  * rewrite. Runs on cloned sessions so the shared test session's
  * optimizer is never mutated.
  */
class TopKRewriteSpec extends SparkSpec {

  private def rewritten(): SparkSession = {
    val s2 = spark.newSession()
    TopKRewrite.install(s2)
    s2
  }

  private def data(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1, 30.0, 1L), (1, 20.0, 2L), (1, 10.0, 3L), (1, 40.0, 4L),
      (2, 5.0, 5L), (2, 7.0, 6L), (3, 1.0, 7L))
      .toDF("g", "v", "id")
  }

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  test("rank <= k over a partitioned row_number window plans the native exec") {
    val s2 = rewritten()
    val out = windowTopK(data(s2), 2)
    val plan = out.queryExecution.executedPlan.toString
    plan should include("TopKPerGroup [")
    plan should not include "Window"
    plan should not include "WindowGroupLimit"
    val rows = out.select("g", "v", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    rows shouldBe Set((1, 40.0, 4L, 1), (1, 30.0, 1L, 2),
      (2, 7.0, 6L, 1), (2, 5.0, 5L, 2), (3, 1.0, 7L, 1))
  }

  test("rewritten results equal the un-rewritten window form (rank <, literal-first, = 1)") {
    val s2 = rewritten()
    val plainDf = data(spark)
    val fastDf = data(s2)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val shapes: Seq[DataFrame => DataFrame] = Seq(
      d => d.withColumn("rank", row_number().over(w)).where(col("rank") < 3),
      d => d.withColumn("rank", row_number().over(w)).where(lit(3) >= col("rank")),
      d => d.withColumn("rank", row_number().over(w)).where(col("rank") === 1))
    shapes.foreach { mk =>
      val slow = mk(plainDf).collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      val fastQ = mk(fastDf)
      fastQ.queryExecution.executedPlan.toString should include("TopKPerGroup [")
      val fast = fastQ.collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      fast shouldBe slow
    }
  }

  test("conjunctions rewrite: tightest bound feeds the heap, the rest filters above it") {
    val s2 = rewritten()
    val df = data(s2)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    // rank bound + an unrelated predicate: heap k=2, v-filter residual
    val mixed = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 2 && col("v") > 5.0)
    val mixedPlan = mixed.queryExecution.executedPlan.toString
    mixedPlan should include("TopKPerGroup [")
    mixedPlan should not include "Window"
    mixed.select("g", "v", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet shouldBe Set((1, 40.0, 4L, 1), (1, 30.0, 1L, 2), (2, 7.0, 6L, 1))
    // equality above 1: heap k=2, residual keeps only the k-th row
    val kth = df.withColumn("rank", row_number().over(w))
      .where(col("rank") === 2)
    kth.queryExecution.executedPlan.toString should include("TopKPerGroup [")
    kth.select("g", "v", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet shouldBe Set((1, 30.0, 1L, 2), (2, 5.0, 5L, 2))
    // two bounds: the tighter one wins, the looser is absorbed
    val twoBounds = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3 && col("rank") <= 1)
    twoBounds.queryExecution.executedPlan.toString should include("TopKPerGroup [")
    twoBounds.select("g", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet shouldBe
      Set((1, 1), (2, 1), (3, 1))
  }

  test("unsafe patterns keep the window form") {
    val s2 = rewritten()
    val df = data(s2)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val globalW = Window.orderBy(col("v").desc, col("id"))
    val alwaysFalse = df.withColumn("rank", row_number().over(w))
      .where(col("rank") < Int.MinValue)
    val unsafe: Seq[DataFrame] = Seq(
      // rank() is not row_number(): ties share ranks, heap semantics differ
      df.withColumn("rank", rank().over(w)).where(col("rank") <= 2),
      // global window: no partition keys — belongs to sort-limit, not heaps
      df.withColumn("rank", row_number().over(globalW)).where(col("rank") <= 2),
      // no usable bound: a lower bound alone can't size a heap
      df.withColumn("rank", row_number().over(w)).where(col("rank") >= 2),
      // Int.MinValue literal: naive k = v - 1 would wrap positive and
      // turn the always-false filter into emit-everything
      alwaysFalse,
      // multi-expression window: rewriting would drop the second column
      df.withColumn("rank", row_number().over(w))
        .withColumn("mx", max(col("v")).over(Window.partitionBy(col("g"))))
        .where(col("rank") <= 2))
    unsafe.foreach { q =>
      q.queryExecution.executedPlan.toString should include("Window")
    }
    // the always-false filter must actually yield nothing
    alwaysFalse.count() shouldBe 0L
  }

  test("the enabled conf is a per-session kill switch back to the window plan") {
    val s2 = rewritten()
    s2.conf.set(TopKRewrite.EnabledKey, "false")
    try {
      val off = windowTopK(data(s2), 2)
      off.queryExecution.executedPlan.toString should include("Window")
      off.count() shouldBe 5L
    } finally s2.conf.set(TopKRewrite.EnabledKey, "true")
    windowTopK(data(s2), 2).queryExecution.executedPlan.toString should
      include("TopKPerGroup [")
  }

  test("install is scoped to the cloned session, not the shared one") {
    val s2 = rewritten()
    s2.experimental.extraOptimizations should contain(TopKRewrite)
    spark.experimental.extraOptimizations should not contain TopKRewrite
    // and the shared session still plans the window form
    windowTopK(data(spark), 2).queryExecution.executedPlan.toString should
      include("Window")
  }
}
