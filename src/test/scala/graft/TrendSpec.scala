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
}
