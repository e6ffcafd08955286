package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Histograms, Percentiles}

/** Two-pass histogram percentiles must equal the sort-based exact form
  * bit-for-bit on any data.
  */
class HistogramsSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(60), Seed(11L + i)))

  private def both(df: org.apache.spark.sql.DataFrame): (Map[String, Seq[Double]], Map[String, Seq[Double]]) = {
    def m(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(row => row.getString(0) ->
        qs.indices.map(i => row.getDouble(i + 1)).toSeq).toMap
    (m(Histograms.exact(df, Seq("g"), col("v"), qs, bins = 8)),
      m(Percentiles.exact(df, Seq("g"), col("v"), qs)))
  }

  test("equals Percentiles.exact on generated grouped data") {
    val rows = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(-50, 50)))
    samples(rows, 6).foreach { xs =>
      val df = xs.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
      val (h, p) = both(df)
      h shouldBe p
    }
  }

  test("degenerate groups: single row, all-equal values, two values") {
    val df = Seq(
      ("one", 7.0),
      ("same", 3.0), ("same", 3.0), ("same", 3.0),
      ("two", 1.0), ("two", 2.0)).toDF("g", "v")
    val (h, p) = both(df)
    h shouldBe p
    h("one") shouldBe Seq(7.0, 7.0, 7.0)
    h("two") shouldBe Seq(1.25, 1.5, 1.75)
  }

  test("null values are excluded, null keys form their own group") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), None),
      (None, Some(5.0)), (None, Some(6.0)))
      .toDF("g", "v")
    val h = Histograms.exact(df, Seq("g"), col("v"), Seq("p50" -> 0.5), 8)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    h(Some("a")) shouldBe 1.5
    h(None) shouldBe 5.5
  }

  test("plans no unpartitioned window (cum/rank windows partition by group)") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val plan = Histograms.exact(df, Seq("g"), col("v"), qs)
      .queryExecution.optimizedPlan.toString
    // every windowspecdefinition must carry the group key
    plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(l => l should include("g#"))
  }
}
