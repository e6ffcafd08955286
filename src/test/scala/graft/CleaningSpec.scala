package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.clean.Cleaning

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeName replaces spaces and strips parentheses") {
    Cleaning.normalizeName("Enedc (g/km)") shouldBe "Enedc_g/km"
    Cleaning.normalizeName("Country Name") shouldBe "Country_Name"
    Cleaning.normalizeName("plain") shouldBe "plain"
  }

  test("normalizeColumnNames renames every column in one projection") {
    val df = Seq((1, "a")).toDF("col one", "col (two)")
    val out = Cleaning.normalizeColumnNames(df)
    out.columns.toSeq shouldBe Seq("col_one", "col_two")
    out.collect().head shouldBe Row(1, "a")
  }

  test("dropAllNullRows drops only rows where every column is null") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", IntegerType)))
    val rows = Seq(Row(null, null), Row("x", null), Row(null, 1), Row("y", 2))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Cleaning.dropAllNullRows(df)
    out.count() shouldBe 3
    out.where("a is null and b is null").count() shouldBe 0
  }

  test("dedup removes exact duplicates and is idempotent") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val once = Cleaning.dedup(df)
    once.count() shouldBe 2
    Cleaning.dedup(once).count() shouldBe 2
  }

  test("runAudited reports per-stage counts") {
    val df = Seq((1, "a"), (1, "a"), (2, "b"), (3, " c")).toDF("k", "v")
    val (out, counts) = Cleaning.runAudited(df, Seq(
      Cleaning.Stage("dedup", Cleaning.dedup),
      Cleaning.Stage("no_spaces", d => d.where(Cleaning.noSpaces(d("v"))))))
    counts shouldBe Seq("input" -> 4L, "dedup" -> 3L, "no_spaces" -> 2L)
    out.count() shouldBe 2
  }

  test("validity predicates: codeLengthIs / noSpaces / matches") {
    val df = Seq("ABC", "AB", "A C", "ZZ").toDF("code")
    df.where(Cleaning.codeLengthIs($"code", 3)).count() shouldBe 2
    df.where(Cleaning.noSpaces($"code")).count() shouldBe 3
    df.where(Cleaning.matches($"code", "^[A-Z][A-Z]$")).count() shouldBe 2
  }
}
