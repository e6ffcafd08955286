package graft

import org.apache.spark.sql.functions._

import graft.sketch.Kmv

/** Law tests for the round-9 robust/agreement/sketch batches
  * (q362–q372): textbook identities replayed in plain Scala plus a
  * Spark-side KMV sketch exactness check, independent of the DuckDB
  * oracle.
  */
class RobustSpec extends SparkSpec {

  test("q362 Hodges-Lehmann of a known sample is the Walsh-average median") {
    // Hollander & Wolfe ex.: x = (1, 2, 4, 8) — Walsh averages
    // (i <= j): 1, 1.5, 2, 2.5, 3, 4, 4.5, 5, 6, 8 → median = 3.5
    val x = Seq(1.0, 2.0, 4.0, 8.0)
    val walsh = for {
      i <- x.indices; j <- i until x.size
    } yield (x(i) + x(j)) / 2.0
    val sorted = walsh.sorted
    val n = sorted.size
    val med =
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    med shouldBe 3.5 +- 1e-12
    // the dual-min trick used by the query: lower + upper median halves
    val lower = sorted((n + 1) / 2 - 1)
    val upper = sorted((n + 2) / 2 - 1)
    (lower + upper) / 2.0 shouldBe med +- 1e-12
  }

  test("q363 Kendall's W is 1 for perfect agreement, 0 for balanced ranks") {
    // m judges all ranking k items identically → S is maximal and
    // W = 12S/(m^2 k(k^2-1)) = 1
    val m = 7L; val k = 4L
    val rSumsPerfect = (1L to k).map(_ * m) // item i always rank i
    val mean = m * (k + 1) / 2.0
    val s = rSumsPerfect.map(r => (r - mean) * (r - mean)).sum
    val w = 12.0 * s / (m.toDouble * m * k * (k * k - 1))
    w shouldBe 1.0 +- 1e-12
    // a latin-square rotation gives every item the same rank sum → W = 0
    val rSumsFlat = Seq.fill(k.toInt)(m * (k + 1) / 2.0)
    val s0 = rSumsFlat.map(r => (r - mean) * (r - mean)).sum
    s0 shouldBe 0.0 +- 1e-12
  }

  test("q364 Ljung-Box autocorrelation via the n*x - S identity") {
    // r_k computed from devn = n*x_t - S equals the classical
    // sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2): the n factor cancels
    val x = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val n = x.size
    val mean = x.sum / n
    def rClassic(k: Int): Double = {
      val num = (0 until n - k).map(t => (x(t) - mean) * (x(t + k) - mean)).sum
      val den = x.map(v => (v - mean) * (v - mean)).sum
      num / den
    }
    val s = x.sum
    def rInteger(k: Int): Double = {
      val devn = x.map(v => n * v - s)
      val num = (0 until n - k).map(t => devn(t) * devn(t + k)).sum
      val den = devn.map(d => d * d).sum
      num / den
    }
    (1 to 3).foreach { k =>
      rInteger(k) shouldBe rClassic(k) +- 1e-12
    }
  }

  test("q365 Chapman estimator is exact on a closed sampled population") {
    // n1 = 99, n2 = 49, m = 4 → Chapman (99+1)(49+1)/(4+1) - 1 = 999
    // (bias-corrected below the raw Lincoln-Petersen 99*49/4 = 1212.75)
    val n1 = 99L; val n2 = 49L; val m = 4L
    val chapman = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    chapman shouldBe 999.0 +- 1e-9
    val lp = n1.toDouble * n2 / m
    lp shouldBe 1212.75 +- 1e-9
  }

  test("q367 Cohen's kappa integer identity matches the po/pe form") {
    // confusion a=20 b=5 c=10 d=15, N=50
    val (a, b, c, d) = (20L, 5L, 10L, 15L)
    val n = a + b + c + d
    val po = (a + d).toDouble / n
    val pe = ((a + b) * (a + c) + (c + d) * (b + d)).toDouble / (n * n)
    val kappaClassic = (po - pe) / (1 - pe)
    val spe = (a + b) * (a + c) + (c + d) * (b + d)
    val kappaInteger = (n * (a + d) - spe).toDouble / (n * n - spe)
    kappaInteger shouldBe kappaClassic +- 1e-12
  }

  test("q372 Cliff's delta equals 2U/(n1 n2) - 1 against Mann-Whitney U") {
    val xs = Seq(5.0, 7.0, 9.0, 11.0)
    val ys = Seq(4.0, 6.0, 8.0, 10.0)
    val gt = (for { x <- xs; y <- ys } yield if (x > y) 1 else 0).sum
    val lt = (for { x <- xs; y <- ys } yield if (x < y) 1 else 0).sum
    val delta = (gt - lt).toDouble / (xs.size * ys.size)
    // U counts wins (no ties here): delta = 2U/(n1n2) - 1
    val u = gt.toDouble
    delta shouldBe (2 * u / (xs.size * ys.size) - 1) +- 1e-12
  }

  test("KMV sketch: exact below k, unbiased-shaped estimate above k") {
    val s = spark
    import s.implicits._
    val small = (1 to 100).map(i => ("g", s"key$i")).toDF("g", "k")
    val sk = Kmv.minValuesBy(small, col("k"), Seq("g"), 256)
    sk.count() shouldBe 100 // below k: the sketch IS the distinct set
    val est = Kmv.estimateBy(sk, Seq("g"), 256)
      .select("kmv_est").as[Double].head()
    est shouldBe 100.0 +- 1e-9
    val big = (1 to 5000).map(i => ("g", s"key$i")).toDF("g", "k")
    val skB = Kmv.minValuesBy(big, col("k"), Seq("g"), 256)
    skB.count() shouldBe 256 // capped at k
    val estB = Kmv.estimateBy(skB, Seq("g"), 256)
      .select("kmv_est").as[Double].head()
    // KMV standard error is ~1/sqrt(k-2) ≈ 6.3%; assert within 4 sigma
    estB shouldBe 5000.0 +- 5000.0 * 0.25
  }

  test("KMV intersection: matches/k of the union sample tracks Jaccard") {
    val s = spark
    import s.implicits._
    // A = 1..3000, B = 2001..5000 → |A∩B| = 1000, |A∪B| = 5000
    val a = (1 to 3000).map(i => ("a", s"key$i")).toDF("g", "k")
    val b = (2001 to 5000).map(i => ("b", s"key$i")).toDF("g", "k")
    val skA = Kmv.minValuesBy(a, col("k"), Seq("g"), 256).select("h")
    val skB = Kmv.minValuesBy(b, col("k"), Seq("g"), 256).select("h")
    val row = Kmv.intersectEstimate(skA, skB, 256)
      .select("est_union", "est_intersect").head()
    row.getDouble(0) shouldBe 5000.0 +- 5000.0 * 0.25
    row.getDouble(1) shouldBe 1000.0 +- 1000.0 * 0.60
  }
}
