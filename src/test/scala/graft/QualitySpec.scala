package graft

import org.apache.spark.sql.functions._

import graft.ops.Expectations
import graft.similarity.Similarity

/** Laws for the round-5 quality batch: expectation-report counting and
  * the semantic-dedup keep/drop invariants.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("expectation report counts each violation class exactly") {
    import Expectations._
    val df = Seq(
      (Some(1L), Some(0.05), "A"),
      (None, Some(0.05), "N"),     // null key
      (Some(3L), Some(0.50), "R"), // out of range
      (Some(3L), None, "X"),       // null range value + bad flag; dup key
      (Some(5L), Some(0.0), "A")   // boundary ok
    ).toDF("k", "d", "f")
    val rep = report(df, Seq(
        notNull("nn", col("k")),
        inRange("rg", col("d"), 0, 0.1),
        inSet("st", col("f"), Seq("A", "N", "R")),
        unique("uq", col("k"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    rep("nn") shouldBe (1L, false)
    rep("rg") shouldBe (2L, false) // 0.50 out of range + null
    rep("st") shouldBe (1L, false)
    // 5 rows, distinct non-null keys {1,3,5} -> count-distinct treats the
    // null row as its own violation too: 5 - 3 = 2
    rep("uq") shouldBe (2L, false)
  }

  test("report over an empty frame is all-pass, not all-null") {
    import Expectations._
    val empty = Seq.empty[(Option[Long], String)].toDF("k", "f")
    val rep = report(empty, Seq(
        notNull("nn", col("k")), inSet("st", col("f"), Seq("A"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    rep("nn") shouldBe (0L, true)
    rep("st") shouldBe (0L, true)
  }

  test("refIntegrity flags exactly the orphan child keys") {
    import Expectations._
    val child = Seq(1L, 2L, 2L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = refIntegrity("ri", child, col("ck"), parent, col("pk"))
      .collect().head
    row.getLong(1) shouldBe 1L
    row.getBoolean(2) shouldBe false
    // all-present case passes
    val ok = refIntegrity("ri", Seq(1L, 3L).toDF("ck"), col("ck"),
      parent, col("pk")).collect().head
    ok.getLong(1) shouldBe 0L
    ok.getBoolean(2) shouldBe true
  }

  test("semDedup: drops have a lower near neighbour; kept set is clean") {
    val dim = 8
    // three exact duplicate groups + isolated vectors: duplicates land in
    // the same bucket with cosine 1.0
    val base = Seq.tabulate(6)(i =>
      Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat))
    val rows = (0 until 6).map(i => (i.toLong, base(i))) ++
      Seq((10L, base(0)), (11L, base(0)), (12L, base(3)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, dim, nBits = 4, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val kept = out.filter(_._3).map(_._1).toSet
    val dropped = out.filter(!_._3).map(_._1).toSet
    // exact duplicates of 0 and 3 are dropped, originals kept
    dropped shouldBe Set(10L, 11L, 12L)
    kept shouldBe Set(0L, 1L, 2L, 3L, 4L, 5L)
    out.length shouldBe 9 // one row per vector
  }
}
