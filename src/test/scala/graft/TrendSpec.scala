package graft

import org.apache.spark.sql.functions._

import graft.graph.Assortativity
import graft.ops.Trend

/** Round-5 batch 11: Theil-Sen / Mann-Kendall trend statistics and
  * degree assortativity, verified against hand-computed values.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("Trend.theilSenMk matches the hand-computed slope, S, and z") {
    // Group 1: y = 2x exactly at x=0..4 → every pairwise slope is 2,
    // S = 10 (all 10 pairs increasing), var = 5*4*15/18.
    // Group 2: strictly decreasing 9,7,2 at x=0,1,2 → slopes
    // {-2,-3.5,-5}, lower median (n=3 → rn=2) = -3.5, S = -3.
    val df = Seq(
      (1, 0, 0.0), (1, 1, 2.0), (1, 2, 4.0), (1, 3, 6.0), (1, 4, 8.0),
      (2, 0, 9.0), (2, 1, 7.0), (2, 2, 2.0))
      .toDF("g", "x", "y")
    val out = Trend.theilSenMk(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    out(1)._1 shouldBe 5L
    out(1)._2 shouldBe 2.0
    out(1)._3 shouldBe 10L
    val z1 = (10.0 - 1) / math.sqrt(5.0 * 4 * 15 / 18.0)
    out(1)._4 shouldBe (math.BigDecimal(z1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    out(2)._2 shouldBe -3.5
    out(2)._3 shouldBe -3L
  }

  test("Trend.theilSenMk drops groups below minPoints") {
    val df = Seq((1, 0, 1.0), (1, 1, 2.0)).toDF("g", "x", "y")
    Trend.theilSenMk(df, col("g"), col("x"), col("y")).count() shouldBe 0L
  }

  test("Theil-Sen shrugs off an outlier that wrecks the mean slope") {
    // y = x except one wild outlier; Theil-Sen stays ~1.
    val pts = (0 to 9).map(i => (1, i, if (i == 5) 1000.0 else i.toDouble))
    val out = Trend.theilSenMk(pts.toDF("g", "x", "y"),
      col("g"), col("x"), col("y")).collect().head
    out.getDouble(2) shouldBe 1.0
  }

  test("Assortativity is -1 on a perfect star and positive on a clique+pendant mix") {
    // Star: center degree 4, leaves degree 1 — every edge pairs (4,1) →
    // correlation of x,y over {(4,1),(1,4)}×4 = -1 exactly.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val r = Assortativity.degreeAssortativity(star).collect().head
    r.getLong(0) shouldBe 8L
    r.getDouble(1) shouldBe -1.0
    // Two disjoint triangles (all degrees 2) + a 2-path: mixed degrees,
    // assortativity defined and computed without NaN.
    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (7L, 8L), (8L, 9L)).toDF("a", "b")
    val r2 = Assortativity.degreeAssortativity(mixed).collect().head
    r2.getDouble(1) should (be >= -1.0 and be <= 1.0)
  }

  test("q333 STL algebra: linear trend vanishes, weekly pattern recovers " +
      "mean-centered seasonal exactly") {
    import org.apache.spark.sql.expressions.Window
    // Worked vector for the q333_stl_decompose pipeline (same window +
    // detrended×7 integer trick on a hand series). 21 consecutive days
    // starting on a Monday:
    //   type "a": v = 70000·t + 10000·s, s = isodow−1 ∈ 0..6
    //   type "b": v = 70000·t (pure linear)
    // A centered 7-point MA reproduces a linear series exactly, so
    // detr7 = 7v − Σ₇v = 10000·(7s − 21) for "a" and 0 for "b"; the
    // seasonal output Σdetr7/(70000·n) is then s − 21/7 = isodow − 4
    // (classic mean-centered weekly effect) and 0 respectively — exact
    // integers, no tolerance needed.
    val start = java.time.LocalDate.of(2024, 1, 1) // a Monday
    val rows = (0 until 21).flatMap { t =>
      val day = java.sql.Date.valueOf(start.plusDays(t.toLong))
      val s = start.plusDays(t.toLong).getDayOfWeek.getValue - 1
      Seq(("a", day, 70000L * t + 10000L * s), ("b", day, 70000L * t))
    }
    val d = rows.toDF("event_type", "day", "v")
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val t = d.select(col("event_type"), col("day"), col("v"),
      sum(col("v")).over(w7).as("s7"), count(lit(1)).over(w7).as("c7"))
    val out = t.where(col("c7") === 7)
      .select(col("event_type"), (weekday(col("day")) + 1).as("dow"),
        (lit(7) * col("v") - col("s7")).as("detr7"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("detr7").cast("decimal(38,0)")).cast("double")
          / (lit(70000) * count(lit(1))), 6).as("seasonal"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    out.size shouldBe 14 // 7 weekdays × 2 types, 15 interior days each
    (1 to 7).foreach { dow =>
      out(("a", dow)) shouldBe (dow - 4).toDouble // mean-centered seasonal
      out(("b", dow)) shouldBe 0.0 // linear series has no seasonal
    }
  }
}
