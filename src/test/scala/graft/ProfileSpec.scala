package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** One-call summary() profile + conf introspection. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summary matches hand-computed stats, quartiles interpolate") {
    // v = 1..4: s1 = 10, s2 = 30, mean = 2.5, var = (30 - 25)/3 = 5/3;
    // p25: pos = 0.75 -> 1 + 0.75*(2-1) = 1.75; p50 = 2.5; p75 = 3.25
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    val r = Profile.summary(df, Seq("v")).collect().head
    r.getString(0) shouldBe "v"
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe 2.5
    r.getDouble(3) shouldBe math.sqrt(5.0 / 3.0) +- 1e-12
    r.getDouble(4) shouldBe 1.0
    r.getDouble(5) shouldBe 1.75
    r.getDouble(6) shouldBe 2.5
    r.getDouble(7) shouldBe 3.25
    r.getDouble(8) shouldBe 4.0
  }

  test("summary profiles several columns in one call, excludes nulls") {
    val df = Seq((1L, 1.0, Some(10.0)), (2L, 3.0, None))
      .toDF("id", "a", "b")
    val out = Profile.summary(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    out(0).getLong(1) shouldBe 2L
    out(1).getLong(1) shouldBe 1L          // the null b row is excluded
    out(1).isNullAt(3) shouldBe true       // single value -> NULL stddev
    out(1).getDouble(6) shouldBe 10.0      // p50 of one row is that row
  }

  test("confDump resolves pinned keys and marks unknown ones") {
    val rows = graft.io.Catalog.confDump(spark,
        Seq("spark.sql.session.timeZone", "graft.no.such.conf"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows("spark.sql.session.timeZone") shouldBe "UTC"
    rows("graft.no.such.conf") shouldBe "<unset>"
  }

  test("confDump with no keys lists documented confs (SET -v shape)") {
    val df = graft.io.Catalog.confDump(spark)
    df.columns.toSeq shouldBe Seq("conf_key", "conf_value")
    df.where(col("conf_key") === "spark.sql.adaptive.enabled")
      .count() shouldBe 1L
  }
}
