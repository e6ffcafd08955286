package graft

import org.apache.spark.sql.functions._

import graft.text.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // N = 4 docs; "spark" in 2, "data" in 3, "the" in all 4.
  private def docs = Seq(
    (1L, "the spark engine processes the data"),
    (2L, "the data pipeline feeds spark"),
    (3L, "the data lake"),
    (4L, "the cat sat")).toDF("doc_id", "text")

  test("termFrequencies counts tokens per document") {
    val tf = TfIdf.termFrequencies(docs, $"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    tf((1L, "the")) shouldBe 2L
    tf((1L, "spark")) shouldBe 1L
    tf.get((2L, "engine")) shouldBe None
  }

  test("tfidf matches the hand computation tf * ln(N/df)") {
    val out = TfIdf.tfidf(docs, $"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // "the": df=4, N=4 -> ln(1) = 0 everywhere, regardless of tf.
    out((1L, "the")) shouldBe 0.0
    // "spark" in doc 1: tf=1, df=2 -> ln(2).
    out((1L, "spark")) shouldBe math.rint(math.log(2.0) * 1e6) / 1e6
    // "data": tf=1, df=3 -> ln(4/3).
    out((3L, "data")) shouldBe math.rint(math.log(4.0 / 3.0) * 1e6) / 1e6
  }

  test("topKeywords ranks by score desc with token tie-break") {
    val top = TfIdf.topKeywords(docs, $"doc_id", $"text", k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    // Doc 4: "cat" and "sat" tie at ln(4); alphabetical order breaks it.
    top.filter(_._1 == 4L).map(t => (t._2, t._3)) shouldBe Seq(("cat", 1), ("sat", 2))
    // Every doc contributes exactly k rows (all have >= 2 distinct tokens).
    top.groupBy(_._1).view.mapValues(_.length).toMap.values.toSet shouldBe Set(2)
  }
}
