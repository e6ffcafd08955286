package graft

import org.apache.spark.sql.functions._

import graft.ops.Skyline
import graft.text.Dsir

/** Round-5 selection operators: Pareto skyline and DSIR importance
  * weights.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("Skyline.pareto equals the naive dominance filter") {
    val pts = Seq(
      (1L, 1.0, 5), (2L, 1.0, 4), (3L, 2.0, 7), (4L, 2.0, 7), (5L, 3.0, 7),
      (6L, 0.5, 2), (7L, 4.0, 9), (8L, 4.5, 9), (9L, 5.0, 1))
      .toDF("id", "price", "size")
    val sky = Skyline.pareto(pts, col("price"), col("size"))
      .collect().map(_.getLong(0)).toSet
    val all = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val naive = all.filter { case (_, p, s) =>
      !all.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet
    sky shouldBe naive
    // duplicate frontier points both survive; dominated same-price rows don't
    sky should contain allOf (3L, 4L)
    sky should not contain 2L
  }

  test("Skyline.pareto of a single point is that point") {
    val one = Seq((1L, 2.0, 3)).toDF("id", "price", "size")
    Skyline.pareto(one, col("price"), col("size"))
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("Dsir scores target-like documents above off-target ones") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "alpha beta alpha beta alpha", false), // looks like target
      (4L, "gamma delta gamma delta gamma", false)) // does not
      .toDF("id", "text", "tgt")
    val scores = Dsir.score(docs, col("id"), col("text"), col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target is a SUBSET of raw, so scores are a relative contrast (a
    // shared feature has cT <= cR): the assertion is ordering, not sign
    scores(3L) should be > scores(4L)
    scores(1L) should be > scores(4L)
    scores(2L) should be > scores(4L)
  }
}
