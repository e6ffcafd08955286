package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Events, Stats}
import graft.pipelines.Corpus

/** Training-prep operators: annotator agreement, temporal-split audit,
  * token-budget selection, padding-waste profile (q248–q251).
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("cohensKappa: perfect agreement is 1, perfect disagreement is -1") {
    val agree = Seq((1, 1), (0, 0), (1, 1), (0, 0)).toDF("a", "b")
    val r1 = Stats.cohensKappa(agree, $"a" === 1, $"b" === 1).head()
    r1.getDouble(5) shouldBe 1.0   // kappa
    r1.getDouble(3) shouldBe 1.0   // po
    val disagree = Seq((1, 0), (0, 1), (1, 0), (0, 1)).toDF("a", "b")
    Stats.cohensKappa(disagree, $"a" === 1, $"b" === 1)
      .head().getDouble(5) shouldBe -1.0
  }

  test("cohensKappa matches the hand-computed 2x2 example") {
    // Classic worked example: n=50, both-yes 20, both-no 15, a-only 10,
    // b-only 5 -> po = 0.7, pe = 0.3*0.5 + 0.7*0.5 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(15)((0, 0)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(5)((0, 1))
    val r = Stats.cohensKappa(rows.toDF("a", "b"), $"a" === 1, $"b" === 1)
      .head()
    r.getLong(0) shouldBe 50L
    r.getDouble(3) shouldBe 0.7
    r.getDouble(4) shouldBe 0.5
    r.getDouble(5) shouldBe 0.4 +- 1e-9
  }

  test("fleissKappa: unanimous mixed-category raters give kappa 1") {
    val rows = Seq((1, 1, 1), (0, 0, 0), (1, 1, 1), (0, 0, 0))
      .toDF("a", "b", "c")
    val r = Stats.fleissKappa(rows,
      Seq($"a" === 1, $"b" === 1, $"c" === 1)).head()
    r.getDouble(3) shouldBe 1.0   // p_bar
    r.getDouble(5) shouldBe 1.0   // kappa
  }

  test("fleissKappa matches the hand-computed 3-rater example") {
    // items' category-1 votes: 3, 0, 2 -> S = 9 + 9 + 5 = 23,
    // pbar = (23 - 9)/18 = 7/9, p1 = 5/9, pe = 41/81,
    // kappa = (63/81 - 41/81)/(40/81) = 22/40 = 0.55 exactly
    val rows = Seq((1, 1, 1), (0, 0, 0), (1, 1, 0)).toDF("a", "b", "c")
    val r = Stats.fleissKappa(rows,
      Seq($"a" === 1, $"b" === 1, $"c" === 1)).head()
    r.getLong(0) shouldBe 3L
    r.getInt(1) shouldBe 3
    r.getDouble(2) shouldBe 0.555556   // p1
    r.getDouble(3) shouldBe 0.777778   // p_bar
    r.getDouble(4) shouldBe 0.506173   // p_e
    r.getDouble(5) shouldBe 0.55
  }

  test("temporalSplitAudit counts sides and cross-boundary users per type") {
    val ev = Seq(
      (1L, "2024-01-10 00:00:00", "click"),  // u1 click: train only
      (2L, "2024-01-10 00:00:00", "click"),  // u2 click: both -> leak
      (2L, "2024-01-20 00:00:00", "click"),
      (3L, "2024-01-20 00:00:00", "click"),  // u3 click: test only
      (1L, "2024-01-20 00:00:00", "view"))   // u1 view: test only
      .toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val out = Events.temporalSplitAudit(ev,
        lit("2024-01-16 00:00:00").cast("timestamp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out shouldBe Map(
      "click" -> ((2L, 2L, 1L)),
      "view" -> ((0L, 1L, 0L)))
  }

  test("purgedWalkForward: embargo sits between train and test, all exact") {
    // origin 0, fold width 100us, embargo 10us; events at us 0..299
    val ev = (0L until 300L).map(i => Tuple1(i)).toDF("us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = Events.purgedWalkForward(ev, $"ts", originUs = 0L,
        foldUs = 100L, embargoUs = 10L, folds = Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // fold 1: train [0, 90), embargo [90, 100), test [100, 200)
    out(1) shouldBe ((90L, 10L, 100L))
    // fold 2: train [0, 190), embargo [190, 200), test [200, 300)
    out(2) shouldBe ((190L, 10L, 100L))
  }

  test("budgetSelect equals the single-partition running-sum filter") {
    val docs = (1L to 40L).map(i => (i, i % 7 + 1, 100 - i))
      .toDF("id", "tokens", "quality")
    val w = Window.orderBy($"quality".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs.withColumn("cum_tokens", sum($"tokens").over(w))
      .where($"cum_tokens" <= 60)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toSet
    val got = Corpus.budgetSelect(docs, Seq($"quality".desc, $"id"),
        $"tokens", budget = 60L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toSet
    got shouldBe expected
    got should not be empty
  }

  test("paddingWaste buckets and sums by hand") {
    val docs = Seq(10L, 40L, 70L, 300L).toDF("n_tokens")
    val out = Corpus.paddingWaste(docs, $"n_tokens",
        seqLens = Seq(32, 64, 128, 256), overflowLen = 512)
      .orderBy("seq_len").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    out(32L) shouldBe ((1L, 10L, 22L, 0.6875))
    out(64L) shouldBe ((1L, 40L, 24L, 0.375))
    out(128L) shouldBe ((1L, 70L, 58L, 0.453125))
    out(512L) shouldBe ((1L, 300L, 212L, 0.414063))
  }
}
