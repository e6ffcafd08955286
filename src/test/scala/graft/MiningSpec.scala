package graft

import org.apache.spark.sql.functions._

import graft.dedup.Fuzzy
import graft.graph.Triangles
import graft.ops.{Stats, TimeSeries}
import graft.text.Bm25

/** Round-5 mining operators: triangle counting, fuzzy matching, EWMA,
  * grouped statistics, BM25.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("Triangles finds exactly the hand-enumerated triangles") {
    // K4 on {1,2,3,4} (4 triangles) plus pendant 5-1 and an isolated
    // edge 6-7; edges given in mixed directions with duplicates.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L),
      (4L, 2L), (5L, 1L), (6L, 7L), (7L, 6L)).toDF("a", "b")
    val tris = Triangles.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    tris shouldBe Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L))
    val counts = Triangles.nodeTriangleCounts(Triangles.triangles(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("Triangles on a triangle-free graph is empty") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    Triangles.triangles(star).count() shouldBe 0L
  }

  test("Fuzzy.matchPairs equals the naive all-pairs filter") {
    val names = Seq("red widget", "red gadget", "blue bolt", "blue boltt",
      "glue bolt", "bolt", "entirely other", "red widget")
      .toDF("name")
    val banded = Fuzzy.matchPairs(names, col("name"), 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val distinct = names.distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val naive = (for {
      a <- distinct; b <- distinct if a < b
      d = lev(a, b) if d >= 1 && d <= 2
    } yield (a, b, d)).toSet
    banded shouldBe naive
    // the blocked join must include cross-length matches up to the cap
    banded.map(p => (p._1, p._2)) should contain("blue bolt" -> "blue boltt")
  }

  test("TimeSeries.ewma matches the hand-computed recurrence") {
    val daily = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 20.0),
      (1L, "2024-01-03", 40.0),
      (2L, "2024-01-01", 5.0))
      .toDF("k", "d", "x").withColumn("d", to_date(col("d")))
    val out = TimeSeries.ewma(daily, col("k"), col("d"), col("x"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap
    out((1L, "2024-01-01")) shouldBe 10.0
    // (20*2 + 10*1) / 3
    out((1L, "2024-01-02")) shouldBe (50.0 / 3 * 1e6).round / 1e6
    // (40*4 + 20*2 + 10*1) / 7
    out((1L, "2024-01-03")) shouldBe (210.0 / 7)
    out((2L, "2024-01-01")) shouldBe 5.0
  }

  test("LinkPrediction.adamicAdar scores wedges, drops known edges and hubs") {
    import graft.graph.LinkPrediction
    // path 1-2-3: the only candidate is (1,3) through center 2 (deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = LinkPrediction.adamicAdar(path, maxDeg = 100, k = 10).collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((1L, 3L, 1L))
    out.head.getDouble(3) shouldBe 1.0 / math.log(2) +- 1e-6
    // triangle: every wedge pair is already an edge -> nothing predicted
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    LinkPrediction.adamicAdar(tri, maxDeg = 100, k = 10).count() shouldBe 0L
    // hub cap: a star center above maxDeg contributes no wedges
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("a", "b")
    LinkPrediction.adamicAdar(star, maxDeg = 2, k = 10).count() shouldBe 0L
  }

  test("TimeSeries.intervalCoverage merges overlapping and touching intervals") {
    val iv = Seq(
      ("u1", 0L, 10L, 1L), ("u1", 5L, 12L, 2L),   // overlap -> one island
      ("u1", 12L, 15L, 3L),                       // touching -> still merged
      ("u1", 20L, 30L, 4L),                       // gap -> new island
      ("u2", 0L, 1L, 5L))
      .toDF("k", "s", "e", "id")
    val out = TimeSeries.intervalCoverage(iv, col("k"), col("s"), col("e"),
        col("id")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    out("u1") shouldBe ((4L, 2L, 25L))   // [0,15] + [20,30] = 15 + 10
    out("u2") shouldBe ((1L, 1L, 1L))
  }

  test("TimeSeries.ewma forgets observations beyond the horizon") {
    val daily = Seq(
      (1L, "2024-01-01", 100.0), (1L, "2024-03-01", 8.0))
      .toDF("k", "d", "x").withColumn("d", to_date(col("d")))
    val out = TimeSeries.ewma(daily, col("k"), col("d"), col("x"))
      .where(col("day") === "2024-03-01").collect()
    out.head.getDouble(2) shouldBe 8.0
  }

  test("Stats.corrRegr recovers an exact linear relationship") {
    val df = Seq.tabulate(50)(i => ("g", i.toDouble, 2.0 * i + 1.0))
      .toDF("g", "x", "y")
    val r = Stats.corrRegr(df, Seq(col("g")), col("x"), col("y")).collect().head
    r.getDouble(2) shouldBe 1.0 // corr
    r.getDouble(3) shouldBe 2.0 // slope
    r.getDouble(4) shouldBe 1.0 // intercept
  }

  test("Stats.mode breaks count ties to the smallest value") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"), ("a", "z"),
      ("b", "q")).toDF("g", "v")
    val m = Stats.mode(df, Seq(col("g")), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    m("a") shouldBe (("x", 2L, 3L))
    m("b") shouldBe (("q", 1L, 1L))
  }

  test("Stats.argmax/argmin are tie-deterministic") {
    val df = Seq(("g", 5.0, 1L), ("g", 5.0, 9L), ("g", 1.0, 7L))
      .toDF("g", "v", "id")
    val r = df.groupBy("g").agg(
      Stats.argmax(col("v"), col("id"), col("id")).as("hi"),
      Stats.argmin(col("v"), col("id"), col("id")).as("lo"))
      .collect().head
    r.getLong(1) shouldBe 9L // tie on v=5.0 -> larger id wins
    r.getLong(2) shouldBe 7L // unique min v=1.0
  }

  test("Bm25 scoring joins the model tables broadcast (corpus never shuffles on content)") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("id", "text")
    val plan = Bm25.score(docs, col("id"), col("text"), Seq("alpha"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("Bm25 ranks higher-tf docs above lower-tf docs of equal length") {
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta beta gamma"),
      (3L, "delta delta delta delta")).toDF("id", "text")
    val scores = Bm25.score(docs, col("id"), col("text"), Seq("alpha"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    scores.keySet shouldBe Set(1L, 2L)
    scores(1L) should be > scores(2L)
  }

  test("Hits scores are exact alternating-path counts on a hand graph") {
    // bipartite: hubs {1,2}, authorities {10, 20}; 1->{10,20}, 2->{10}
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("src", "dst")
    val sc = graft.graph.Hits.run(edges, 2)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDecimal(1).longValueExact()).toMap
    // a1 = indegree: a(10)=2, a(20)=1; h1 = sum of a over out-edges:
    // h(1)=3, h(2)=2; a2 = sum of h over in-edges: a(10)=5, a(20)=3;
    // h2: h(1)=8, h(2)=5 — Fibonacci-flavored path counts
    toMap(sc.auths) shouldBe Map(10L -> 5L, 20L -> 3L)
    toMap(sc.hubs) shouldBe Map(1L -> 8L, 2L -> 5L)
    // the broadcast=false regime computes the identical fixed point
    val sc2 = graft.graph.Hits.run(edges, 2, broadcastScores = false)
    toMap(sc2.auths) shouldBe toMap(sc.auths)
    toMap(sc2.hubs) shouldBe toMap(sc.hubs)
  }
}
