package graft

import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("t").select(c($"t").as("out"))

  test("normalizeText collapses whitespace, trims spaces, lowercases") {
    one("  Hello \t  WORLD  ", TextAnalysis.normalizeText)
      .as[String].head() shouldBe "hello world"
    // trim strips SPACES only (both engines) — other edge whitespace
    // collapses to a single space; identical on Spark and DuckDB, which
    // is what the oracle parity requires
    one("Hello\n", TextAnalysis.normalizeText)
      .as[String].head() shouldBe "hello "
  }

  test("tokenCount and bpeishCount") {
    one("one two  three", TextAnalysis.tokenCount).as[Int].head() shouldBe 3
    // "abc123!x" -> [abc][123][!][x] = 4 bpe-ish tokens
    one("abc123!x", TextAnalysis.bpeishCount).as[Int].head() shouldBe 4
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fp = (s: String) => one(s, TextAnalysis.fingerprint).as[String].head()
    fp("Hello  World") shouldBe fp("hello world")
    fp("hello world") should not be fp("hello worlds")
  }

  test("langId picks the dominant marker language, und when none") {
    val lid = (s: String) => one(s, TextAnalysis.langId).as[String].head()
    lid("the cat sat on the mat with a hat of wool") shouldBe "en"
    lid("el perro y la casa que vimos ayer") shouldBe "es"
    lid("der Hund und die Katze und der Vogel") shouldBe "de"
    lid("le chat et les chiens et le merle") shouldBe "fr"
    lid("xyzzy plugh") shouldBe "und"
  }

  test("qualityScore in [0,1]; clean prose scores above symbol soup") {
    val qs = (s: String) => one(s, TextAnalysis.qualityScore).as[Double].head()
    val clean = qs("a perfectly ordinary english sentence about data pipelines")
    val soup = qs("$$@! ## %% ^^ && ** (( )) {{ }} [[ ]]")
    clean should (be >= 0.0 and be <= 1.0)
    soup should (be >= 0.0 and be <= 1.0)
    clean should be > soup
  }

  test("rollingHash: known value, empty string, null propagation") {
    import graft.functions.RollingHash
    one("abc", RollingHash.rollingHash).as[Long].head() shouldBe 96354L
    one("", RollingHash.rollingHash).as[Long].head() shouldBe 0L
    Seq(Option.empty[String]).toDF("t")
      .select(RollingHash.rollingHash($"t")).head().isNullAt(0) shouldBe true
  }

  test("countOccurrences counts non-overlapping literal matches") {
    one("aXbXcX", c => TextAnalysis.countOccurrences(c, "X"))
      .as[Int].head() shouldBe 3
    one("a.b.c", c => TextAnalysis.countOccurrences(c, "."))
      .as[Int].head() shouldBe 2 // regex metachar quoted -> literal
  }

  test("VocabStats.chao1 applies the bias-corrected singleton estimate") {
    import graft.text.VocabStats
    // g1 tokens a a b c: V=3, f1=2 (b,c), f2=1 (a)
    //   -> chao1 = 3 + 2*1/(2*2) = 3.5
    // g2 all-unique: f2=0 stays defined via the +1 denominator
    val toks = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "x"), ("g2", "y")).toDF("g", "tok")
    val out = VocabStats.chao1(toks, Seq("g")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))
      .toMap
    out("g1") shouldBe ((3L, 4L, 2L, 1L, 3.5))
    out("g2") shouldBe ((2L, 2L, 2L, 0L, 2.0 + 2.0 * 1 / 2))
  }
}
