package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StringSim

/** JaroWinkler expression: DuckDB-agreement vectors (probed against
  * `jaro_winkler_similarity` directly), codegen/interpreted parity, and
  * null semantics.
  */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler matches DuckDB's empirical vectors") {
    jw("martha", "marhta") shouldBe 0.9611111111111111 +- 1e-15
    jw("DWAYNE", "DUANE") shouldBe 0.8400000000000001 +- 1e-15
    jw("CRATE", "TRACE") shouldBe 0.7333333333333334 +- 1e-15
    jw("abcd", "acbd") shouldBe 0.9249999999999999 +- 1e-15
    // boost threshold: jaro <= 0.7 gets NO prefix boost (DuckDB semantics)
    jw("abcdex", "abpqrs") shouldBe 0.5555555555555555 +- 1e-15
    jw("prefixab", "prefixcd") shouldBe 0.9 +- 1e-15
    // zero-window positional miss and empties
    jw("ab", "ba") shouldBe 0.0
    jw("abc", "xyz") shouldBe 0.0
    jw("", "") shouldBe 0.0
    jw("a", "") shouldBe 0.0
    jw("a", "a") shouldBe 1.0
  }

  private def dl(a: String, b: String): Int =
    StringSim.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerauLevenshtein is UNRESTRICTED (DuckDB semantics), not OSA") {
    dl("kitten", "sitting") shouldBe 3
    dl("ab", "ba") shouldBe 1
    dl("ca", "abc") shouldBe 2 // OSA would say 3 — transposed pair edited again
    dl("", "abc") shouldBe 3
    dl("abc", "") shouldBe 3
    dl("same", "same") shouldBe 0
    dl("spark", "sprak") shouldBe 1
  }

  test("DamerauLevenshtein column: codegen equals interpreted, filters work") {
    val v = Seq("table", "tabel", "cable", "bale").toDF("tok")
    val pairs = v.select(col("tok").as("a"))
      .join(v.select(col("tok").as("b")), col("a") < col("b"))
      .withColumn("d", StringSim.damerauLevenshteinCol(col("a"), col("b")))
      .where(col("d") <= 1)
      .select("a", "b").as[(String, String)].collect().toSet
    pairs should contain(("tabel", "table")) // one transposition
    pairs should not contain (("bale", "table"))
  }

  test("JaroWinkler column: codegen path equals interpreted eval, null-safe") {
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option("small ring"), Option("small king")),
      (Option("gizmo"), Option("gadget")),
      (None: Option[String], Option("x")))
      .toDF("a", "b")
    val rows = df.select(StringSim.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .collect()
    rows(0).getDouble(0) shouldBe jw("martha", "marhta")
    rows(1).getDouble(0) shouldBe jw("small ring", "small king")
    rows(2).getDouble(0) shouldBe jw("gizmo", "gadget")
    rows(3).isNullAt(0) shouldBe true
  }

  test("JaroWinkler survives a filter pushed through a join (codegen dedup)") {
    val v = Seq("table", "cable", "tablet", "spark", "sharp").toDF("tok")
    val out = v.select(col("tok").as("a"))
      .join(v.select(col("tok").as("b")), col("a") < col("b"))
      .where(StringSim.jaroWinklerCol(col("a"), col("b")) >= 0.8)
      .collect()
    out.length should be > 0
  }
}
