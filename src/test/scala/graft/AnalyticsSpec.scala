package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.Bucketed
import graft.ops.Percentiles

/** Round-5 analytics operators: exact percentiles, cluster-collapse
  * dedup, co-bucketed joins, spine gap-fill, funnel counts.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("Percentiles.weightedMedian picks the first half-weight crossing") {
    // group a: (v,w) = (1,1),(2,3),(10,2): total 6, cum 1/4/6 ->
    //   first cw*2 >= 6 is cw=4 at v=2 (NOT the unweighted median)
    // group b: single row is its own weighted median
    val rows = Seq(("a", 1.0, 1L, 1L), ("a", 2.0, 3L, 2L),
      ("a", 10.0, 2L, 3L), ("b", 5.0, 4L, 4L)).toDF("k", "v", "w", "id")
    val out = Percentiles.weightedMedian(rows, Seq("k"), col("v"),
        col("w"), Seq(col("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    out("a") shouldBe ((6L, 2.0))
    out("b") shouldBe ((4L, 5.0))
  }

  test("Percentiles.exact matches a sorted-array reference") {
    val rows = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), // n=4
      ("b", 10.0), // n=1
      ("c", 5.0), ("c", 7.0)) // n=2
    val df = rows.toDF("k", "v")
    val out = Percentiles.exact(df, Seq("k"), col("v"),
        Seq("p0" -> 0.0, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def ref(vs: Seq[Double], q: Double): Double = {
      val pos = (vs.length - 1) * q
      val lo = math.floor(pos).toInt
      val hi = math.min(lo + 1, vs.length - 1)
      vs(lo) + (vs(hi) - vs(lo)) * (pos - math.floor(pos))
    }
    for ((k, vs) <- Seq("a" -> Seq(1.0, 2.0, 3.0, 4.0), "b" -> Seq(10.0),
                        "c" -> Seq(5.0, 7.0))) {
      val (p0, p50, p90, p100) = out(k)
      p0 shouldBe ref(vs, 0.0)
      p50 shouldBe ref(vs, 0.5)
      p90 shouldBe ref(vs, 0.9)
      p100 shouldBe ref(vs, 1.0)
    }
  }

  test("dedupByComponents keeps min-id reps and all unpaired docs") {
    // clusters: {1,2,3} (chain), {10,11}; unpaired: 20, 21
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.dedupByComponents(docs, col("doc_id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 10L -> 2L, 20L -> 1L, 21L -> 1L)
  }

  test("bucketed orders-lineitem join shuffles neither side") {
    val dir = "/root/testdata/sf0.001"
    val (ot, lt) = Bucketed.ordersLineitem(spark, dir, nBuckets = 4)
    val joined = spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    // materialize through AQE so the final plan is the real one
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe plain
    val planned = joined.queryExecution.executedPlan.toString
    // the only exchange is the tiny post-join aggregation shuffle — the
    // join itself reads bucketed scans with no hashpartitioning below it
    "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(planned) shouldBe empty
    "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(planned) shouldBe empty

    // cross-session path: forget the memo and the catalog entries, so the
    // next call must re-register the EXISTING bucketed files via DDL —
    // the layout written once must keep planning shuffle-free for every
    // later session that declares it
    graft.io.Bucketed.resetMemo()
    spark.sql(s"DROP TABLE IF EXISTS $ot")
    spark.sql(s"DROP TABLE IF EXISTS $lt")
    val (ot2, lt2) = Bucketed.ordersLineitem(spark, dir, nBuckets = 4)
    val joined2 = spark.table(ot2)
      .join(spark.table(lt2), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    joined2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe plain
    val planned2 = joined2.queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(planned2) shouldBe empty
    "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(planned2) shouldBe empty
  }

  test("date spine gap-fills missing days with zero") {
    val counts = Seq(("2024-01-01", 2L), ("2024-01-04", 1L))
      .toDF("day", "n").select(to_date(col("day")).as("day"), col("n"))
    val spine = Seq("x").toDF("i").select(
        explode(sequence(to_date(lit("2024-01-01")), to_date(lit("2024-01-05")),
          expr("interval 1 day"))).as("day"))
    val out = spine.join(counts, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day").collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(("2024-01-01", 2L), ("2024-01-02", 0L),
      ("2024-01-03", 0L), ("2024-01-04", 1L), ("2024-01-05", 0L))
  }

  test("funnel stage counts are monotonically non-increasing") {
    val r = SparkEntry.queries("q86_funnel")(spark, "/root/testdata/sf0.001")
      .head()
    val (users, nView, nViewClick, nFunnel) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    users should be > 0L
    nView should be <= users
    nViewClick should be <= nView
    nFunnel should be <= nViewClick
  }
}
