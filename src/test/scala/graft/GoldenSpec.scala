package graft

/** Golden counts (SURVEY.md §5.4): pins the deterministic sf0.001 fixture
  * shapes and a few query row counts — the programmatic form of the
  * reference's printed count audits. A failure here means the fixtures
  * drifted or a query's cardinality changed.
  */
class GoldenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fixture row counts are pinned (seed=42 generation)") {
    val expected = Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L,
      "documents" -> 500L, "embeddings" -> 500L)
    expected.foreach { case (t, n) =>
      withClue(t) { Tables.load(spark, dir, t).count() shouldBe n }
    }
  }

  test("entry flagship returns top-3 nations for each of 5 regions (some ties trimmed)") {
    val rows = SparkEntry.entry(spark).collect()
    rows.length should be >= 5      // at least 1 per region
    rows.length should be <= 15     // at most 3 per region
    rows.map(_.getString(0)).distinct.length shouldBe 5
  }

  test("golden query cardinalities at sf0.001") {
    def n(q: String) = SparkEntry.queries(q)(spark, dir).count()
    n("q01_pricing_summary") shouldBe 6L     // |returnflag| x |linestatus| shapes
    n("q10_distinct") shouldBe 93L           // distinct (nationkey, segment) pairs
    n("q34_dedup_exact") shouldBe 500L       // all documents distinct at this sf
    n("q42_versioned_update") shouldBe 25L   // nation cardinality
  }
}
