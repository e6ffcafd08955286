package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.similarity.Quantize
import graft.sketch.{Hll, Quantiles}

/** Estimator/accuracy properties of the oracle-gated sketch operators
  * (the register/code VALUES are hash-checked by the driver; these specs
  * check the claims made about them).
  */
class SketchSpec extends SparkSpec {

  private lazy val lineitem = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet").cache()
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("HLL estimate from md5 registers lands near exact count distinct") {
    val exact = lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = Hll.estimate(Hll.registers(lineitem, col("l_partkey"), p = 6), p = 6)
    // m=64 → standard error 1.04/sqrt(64) ≈ 13%; allow 3 sigma
    math.abs(est - exact) / exact should be < 0.4
  }

  test("HLL registers merge by per-bucket max (sketch mergeability)") {
    val half1 = lineitem.where(col("l_orderkey") % 2 === 0)
    val half2 = lineitem.where(col("l_orderkey") % 2 === 1)
    val merged = Hll.registers(half1, col("l_partkey"), 6)
      .unionByName(Hll.registers(half2, col("l_partkey"), 6))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    val whole = Hll.registers(lineitem, col("l_partkey"), 6)
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("int8 quantization reconstructs within half a step") {
    val flat = Quantize.int8(embeddings, col("vec_id"), col("embedding"))
    val orig = embeddings.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
    val err = flat.join(orig, Seq("vec_id", "pos"))
      .select(max(abs(col("q") * col("scale") - col("v").cast("double"))
        / when(col("scale") === 0, 1.0).otherwise(col("scale"))))
      .head().getDouble(0)
    err should be <= 0.5
  }

  test("int8 codes stay in [-127, 127] and pack to tinyint arrays") {
    val flat = Quantize.int8(embeddings, col("vec_id"), col("embedding"))
    flat.where(col("q") > 127 || col("q") < -127).count() shouldBe 0
    val sz = org.apache.spark.sql.functions.size(_: org.apache.spark.sql.Column)
    val packed = Quantize.toArrays(flat)
    val r = packed.select(col("vec_id"), sz(col("qvec")).as("d")).head()
    r.getInt(1) shouldBe
      embeddings.select(sz(col("embedding"))).head().getInt(0)
  }

  test("estimateBy equals the driver-side estimator, per group") {
    import spark.implicits._
    val p = 6
    // two groups with different true cardinalities
    val df = ((1 to 400).map(i => ("a", i.toLong)) ++
      (1 to 90).map(i => ("b", i.toLong * 7919))).toDF("g", "k")
    val grouped = Hll.estimateBy(
        Hll.registersBy(df, col("k"), Seq("g"), p), Seq("g"), p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("a", "b")) {
      val single = Hll.estimate(
        Hll.registers(df.where(col("g") === g), col("k"), p), p)
      grouped(g) shouldBe single +- 1e-9
      // sanity: within the usual HLL error envelope of the truth
      val exact = df.where(col("g") === g).select("k").distinct().count()
      math.abs(grouped(g) - exact) / exact should be <= 0.25
    }
  }

  // ---- DDSketch mergeable quantiles ----

  private val DdG = 1.02
  private def ddSamples[A](g: Gen[A], n: Int = 12): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(60), Seed(1700L + i)))
  private def build(xs: Seq[Double], maxBins: Int = 4096): Quantiles.Sketch = {
    val agg = new Quantiles.Agg(DdG, maxBins)
    xs.foldLeft(agg.zero)(agg.reduce)
  }
  private val ddValues: Gen[List[Double]] =
    Gen.listOf(Gen.chooseNum(-100000, 100000).map(_ / 7.0))

  test("DDSketch merge is associative, commutative, and equals the whole's sketch") {
    ddSamples(Gen.zip(ddValues, ddValues, ddValues)).foreach { case (a, b, c) =>
      val (sa, sb, sc) = (build(a), build(b), build(c))
      sa.merge(sb).merge(sc) shouldBe sa.merge(sb.merge(sc))
      sa.merge(sb) shouldBe sb.merge(sa)
      sa.merge(sb).merge(sc) shouldBe build(a ++ b ++ c)
    }
  }

  test("DDSketch quantile lands within alpha relative error of percentile_disc") {
    val alpha = (DdG - 1.0) / (DdG + 1.0) + 1e-9
    ddSamples(ddValues.suchThat(_.nonEmpty), 8).foreach { xs =>
      val sk = build(xs)
      val sorted = xs.sorted
      for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
        val rank = math.max(1L, math.ceil(q * xs.size).toLong)
        val exact = sorted((rank - 1).toInt)
        val est = sk.quantile(q, DdG)
        if (exact == 0.0) est shouldBe 0.0
        else math.abs(est - exact) / math.abs(exact) should be <= alpha
      }
    }
  }

  test("DDSketch Aggregator, imperative aggregate, and codegen bucketCounts agree") {
    import spark.implicits._
    val sk = udaf(new Quantiles.Agg(DdG),
      org.apache.spark.sql.Encoders.scalaDouble)
    val li = lineitem.select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val viaAgg = li.groupBy("g").agg(sk(col("v")).as("dd"))
      .select(col("g"), explode(col("dd.pos")).as(Seq("bucket", "cnt")))
      .as[(String, Int, Long)].collect().toSet
    val viaFrame = Quantiles.bucketCounts(li, Seq("g"), col("v"), DdG)
      .as[(String, Int, Long)].collect().toSet
    // the TypedImperativeAggregate (object buffer, shuffle-only serde)
    // must produce the identical state — including across its partial/
    // final merge and serialize/deserialize path
    val viaImp = li.repartition(7).groupBy("g")
      .agg(graft.functions.DDSketchAgg.sketch(col("v"), DdG).as("dd"))
      .select(col("g"), explode(col("dd.pos")).as(Seq("bucket", "cnt")))
      .as[(String, Int, Long)].collect().toSet
    viaAgg shouldBe viaFrame
    viaImp shouldBe viaFrame
    // negatives and zeros land in their stores (imperative path)
    val mixed = Seq(-5.0, -5.0, 0.0, 3.0).toDF("v")
      .agg(graft.functions.DDSketchAgg.sketch(col("v"), DdG).as("dd"))
      .select(col("dd.zero"),
        org.apache.spark.sql.functions.map_values(col("dd.neg")))
      .head()
    mixed.getLong(0) shouldBe 1L
    mixed.getSeq[Long](1).sum shouldBe 2L
  }

  test("DDSketch quantilesFromCounts agrees with the driver-side walk") {
    import spark.implicits._
    val xs = (1 to 500).map(i => (if (i % 2 == 0) "a" else "b", i * 3.5))
    val counts = Quantiles.bucketCounts(xs.toDF("g", "v"), Seq("g"), col("v"), DdG)
    val inFrame = Quantiles.quantilesFromCounts(counts, Seq("g"), Seq(0.5, 0.9), DdG)
      .as[(String, Double, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    for (g <- Seq("a", "b"); q <- Seq(0.5, 0.9)) {
      val sk = build(xs.filter(_._1 == g).map(_._2))
      inFrame((g, q)) shouldBe
        (math.rint(sk.quantile(q, DdG) * 1e6) / 1e6) +- 1e-9
    }
  }

  test("DDSketch collapse caps the positive store and keeps count + upper quantiles") {
    val xs = (1 to 2000).map(_.toDouble)
    val full = build(xs)
    val capped = build(xs, maxBins = 50)
    capped.pos.size should be <= 50
    capped.count shouldBe full.count
    // collapse folds LOW buckets — the q99 estimate is untouched
    capped.quantile(0.99, DdG) shouldBe full.quantile(0.99, DdG)
    capped.quantile(1.0, DdG) shouldBe full.quantile(1.0, DdG)
  }

  test("imperative DDSketch applies the maxBins collapse (pos store capped)") {
    import spark.implicits._
    // 2000 distinct magnitudes at gamma=1.02 -> far more than 50 buckets
    val xs = (1 to 2000).map(_.toDouble)
    val row = xs.toDF("v").repartition(3)
      .agg(graft.functions.DDSketchAgg.sketch(col("v"), DdG, maxBins = 50)
        .as("dd"))
      .select(org.apache.spark.sql.functions.size(col("dd.pos")),
        org.apache.spark.sql.functions
          .aggregate(org.apache.spark.sql.functions.map_values(col("dd.pos")),
            lit(0L), (a, b) => a + b))
      .head()
    row.getInt(0) should be <= 50
    row.getLong(1) shouldBe 2000L // collapse folds, never drops
    // ...and the same policy as Quantiles.Sketch.collapsed: the capped
    // state walks to the same upper quantile as the driver-side build
    val capped = build(xs, maxBins = 50)
    val viaSql = xs.toDF("v")
      .agg(graft.functions.DDSketchAgg.sketch(col("v"), DdG, maxBins = 50)
        .as("dd"))
      .select(explode(col("dd.pos")).as(Seq("bucket", "cnt")))
      .as[(Int, Long)].collect().toMap
    viaSql shouldBe capped.pos
  }

  test("graft_dd_sketch accepts an integer literal gamma") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(1.0, 4.0, 16.0).toDF("v").createOrReplaceTempView("gdd_int_gamma")
    // gamma=2: exact powers of gamma, every value its own bucket
    val n = spark.sql(
      """SELECT size(dd.pos) FROM
        (SELECT graft_dd_sketch(v, 2) AS dd FROM gdd_int_gamma)""")
      .head().getInt(0)
    n shouldBe 3
  }

  test("mergeBy union of grouped sketches equals the union's own sketch") {
    import spark.implicits._
    val p = 6
    // overlapping groups: the union is NOT the sum of the parts
    val df = ((1 to 300).map(i => ("a", i.toLong)) ++
      (151 to 450).map(i => ("b", i.toLong))).toDF("g", "k")
    val merged = Hll.estimateBy(
        Hll.mergeBy(Hll.registersBy(df, col("k"), Seq("g"), p), Nil),
        Nil, p)
      .head().getDouble(0)
    val direct = Hll.estimate(Hll.registers(df, col("k"), p), p)
    merged shouldBe direct +- 1e-9
  }
}
