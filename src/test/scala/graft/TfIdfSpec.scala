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

  test("sparseCosineTopK: identical token profiles score 1.0, ranks are per query") {
    val pair = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),   // identical profile to 1
      (3L, "alpha delta delta"),
      (4L, "epsilon zeta eta")).toDF("doc_id", "text")
    val out = TfIdf.sparseCosineTopK(pair, $"doc_id", $"text",
      queryPred = _ <= 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    out((1L, 2L))._1 shouldBe 1.0
    out((1L, 2L))._2 shouldBe 1  // top neighbour
    // doc 4 shares no token with doc 1 -> no pair at all
    out.keySet should not contain ((1L, 4L))
    // only the two query docs produce result groups
    out.keySet.map(_._1) shouldBe Set(1L, 2L)
  }

  test("hashedCosineTopK: identical docs score 1.0, disjoint docs absent") {
    val pair = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha delta delta"),
      (4L, "epsilon zeta eta")).toDF("doc_id", "text")
    val out = TfIdf.hashedCosineTopK(pair, $"doc_id", $"text",
      buckets = 64, queryPred = _ <= 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    out((1L, 2L)) shouldBe 1.0
    // cosine bounded and the self pair excluded
    out.keySet should not contain ((1L, 1L))
    out.values.foreach(c => c should (be >= -1.0 and be <= 1.0))
  }

  test("UnigramLm: repeated-common-token docs score higher than rare-token docs") {
    import graft.text.UnigramLm
    val corpus = Seq(
      (1L, "common common common common"),
      (2L, "common common common rare")).toDF("doc_id", "text")
    val out = UnigramLm.score(corpus, $"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out(1L)._1 shouldBe 4L
    // doc 1 = all high-probability tokens; doc 2 carries the rare one
    out(1L)._2 should be > out(2L)._2
    // hand check: p(common)=7/8, p(rare)=1/8
    val lp = (x: Double) => math.rint(math.log(x) * 1e6) / 1e6
    out(1L)._2 shouldBe math.rint(lp(7.0 / 8) * 1e6) / 1e6
    out(2L)._2 shouldBe math.rint((3 * lp(7.0 / 8) + lp(1.0 / 8)) / 4 * 1e6) / 1e6
  }

  test("UnigramLm.heldoutCrossEntropy: add-one smoothing + OOV hand check") {
    import graft.text.UnigramLm
    // train doc "a a b": T=3, V=2 -> denom 6; p(a)=(2+1)/6, p(OOV)=1/6
    val corpus = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = UnigramLm.heldoutCrossEntropy(
        corpus, $"doc_id", $"text", $"doc_id" === 1L)
      .head()
    r.getLong(0) shouldBe 2L        // held-out doc id
    r.getLong(1) shouldBe 2L        // n_tokens
    r.getLong(2) shouldBe 1L        // n_oov (the 'c')
    val lp = (x: Double) => math.rint(math.log(x) * 1e6) / 1e6
    val expected = math.rint(-(lp(3.0 / 6) + lp(1.0 / 6)) / 2 * 1e6) / 1e6
    r.getDouble(3) shouldBe expected
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
