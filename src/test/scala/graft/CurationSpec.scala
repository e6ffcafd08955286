package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.graph.PageRank
import graft.sketch.{Bloom, CountMin}
import graft.streaming.Streams
import graft.text.{BigramLm, Chunking}

/** Laws for the round-5 curation batch: chunk coverage, count-min
  * one-sided error, bloom exactness, PageRank conservation, bigram-LM
  * hand check, and streaming earliest-k ≡ batch cap.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("chunks cover every token with the configured overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val ch = Chunking.chunks(docs, col("doc_id"), col("text"), width = 4, stride = 3)
      .orderBy("chunk_id").collect()
    // starts 1,4,7,10 -> windows [1-4][4-7][7-10][10]
    ch.map(_.getAs[Int]("chunk_id")).toSeq shouldBe Seq(0, 1, 2, 3)
    ch.map(_.getAs[Int]("n_tokens")).toSeq shouldBe Seq(4, 4, 4, 1)
    ch.map(_.getAs[String]("chunk")).toSeq shouldBe Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10")
  }

  test("count-min estimates are one-sided: est >= exact for every key") {
    val toks = Seq.tabulate(500)(i => s"w${i % 37}").toDF("token")
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val sketch = CountMin.cells(toks, col("token"), d = 4, w = 32)
    // total counts per sketch row must each equal the stream size
    sketch.groupBy("r").agg(sum("cnt")).collect()
      .foreach(_.getLong(1) shouldBe 500L)
    val est = CountMin.estimate(exact, "token", sketch, d = 4, w = 32)
    est.where(col("cm_est") < col("exact_n")).count() shouldBe 0L
  }

  test("bloom pruned semi-join is exactly the plain semi-join") {
    val probe = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
    val build = Seq(3L, 17L, 400L, 999L, 2000L).toDF("bk")
    val pruned = Bloom.prunedSemiJoin(probe, col("k"), build, col("bk"),
      m = 256, k = 3)
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
    pruned.orderBy("k").collect() shouldBe plain.orderBy("k").collect()
    // no false negatives: every build key passes the membership test
    val f = Bloom.build(build, col("bk"), m = 256, k = 3)
    build.where(f.mightContain(col("bk"))).count() shouldBe 5L
  }

  test("pagerank conserves total rank on a symmetric graph") {
    // square: 1-2, 2-3, 3-4, 4-1 (symmetrized) — all degrees equal, so
    // every node keeps the uniform rank at every iteration
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val pr = PageRank.run(edges, iters = 3).collect()
    pr.length shouldBe 4
    pr.foreach(_.getDouble(1) shouldBe 0.25 +- 1e-12)
  }

  test("bigram LM scores a hand-computed corpus") {
    // corpus: "x y x y" and "x y" -> bigrams: d1: (x y),(y x),(x y); d2: (x y)
    // C(x y)=3, C(y x)=1; prefix counts: C(x .)=3, C(y .)=1; V=2
    val docs = Seq((1L, "x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val out = BigramLm.score(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    val lpXY = BigDecimal(math.log(4.0 / 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpYX = BigDecimal(math.log(2.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.map(_.getLong(1)).toSeq shouldBe Seq(3L, 1L)
    out(0).getDouble(2) shouldBe (lpXY * 2 + lpYX) / 3 +- 1e-5
    out(1).getDouble(2) shouldBe lpXY +- 1e-9
  }

  test("earliestKWithState flushes the per-key earliest k at end of stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // 10-minute watermark delay: the batch-2 out-of-order event must not
    // be dropped as late before it reaches the state function
    val capped = Streams.earliestKWithState(
      input.toDF().toDF("user_id", "ts", "event_id"), cap = 2,
      watermark = "10 minutes")
    val q = capped.toDF().writeStream
      .format("memory").queryName("cap_test").outputMode("append")
      .start()
    try {
      // batch 1: u1 has events at minutes 5, 9; u2 at 7
      input.addData((1L, t(5), 100L), (1L, t(9), 101L), (2L, t(7), 200L))
      q.processAllAvailable()
      spark.table("cap_test").count() shouldBe 0 // nothing flushed yet
      // batch 2: an EARLIER u1 event (out of order) must displace t(9);
      // the far-future sentinel advances the watermark past the flush point
      input.addData((1L, t(3), 102L),
        (-1L, Timestamp.valueOf("2100-01-01 00:00:00"), -1L))
      q.processAllAvailable()
      val rows = spark.table("cap_test")
        .where(col("user_id") =!= -1L)
        .select("user_id", "event_id").as[(Long, Long)].collect().toSet
      rows shouldBe Set((1L, 102L), (1L, 100L), (2L, 200L))
    } finally q.stop()
  }
}
