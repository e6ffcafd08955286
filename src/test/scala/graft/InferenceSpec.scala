package graft

/** Worked-example vectors for the round-9 inference batch (q342–q347):
  * each test replays the query's arithmetic in plain Scala on a
  * hand-checkable input and pins it against the textbook definition,
  * independent of the DuckDB oracle.
  */
class InferenceSpec extends SparkSpec {

  test("q345 Bradley-Terry MM rounds move strengths toward the " +
      "win-probability fixed point") {
    // 3 items, wins: A beats B 8/10, B beats C 7/10, A beats C 9/10.
    val items = Seq("A", "B", "C")
    val wins = Map(("A", "B") -> 8L, ("B", "A") -> 2L,
      ("B", "C") -> 7L, ("C", "B") -> 3L,
      ("A", "C") -> 9L, ("C", "A") -> 1L)
    def nij(i: String, j: String): Long =
      wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L)
    def wTot(i: String): Long =
      items.filter(_ != i).map(j => wins.getOrElse((i, j), 0L)).sum
    // Hunter AOS'04 MM update: p_i <- W_i / sum_j N_ij/(p_i+p_j)
    def mm(p: Map[String, Double]): Map[String, Double] =
      items.map { i =>
        val denom = items.filter(_ != i)
          .map(j => nij(i, j) / (p(i) + p(j))).sum
        i -> wTot(i) / denom
      }.toMap
    val p0 = items.map(_ -> 1.0).toMap
    val p2 = mm(mm(p0))
    val z = p2.values.sum
    val s = p2.map { case (k, v) => k -> v / z }
    // ordering must match the dominance structure
    s("A") should be > s("B")
    s("B") should be > s("C")
    // the MM fixed point satisfies p_A/(p_A+p_B) ~ 8/10 etc.; after two
    // rounds the implied win probabilities are already in the right
    // neighborhood, and two MORE rounds move every one of them closer
    // (MM monotonicity, Hunter AOS'04 Thm 1)
    def gap(p: Map[String, Double]): Double =
      math.abs(p("A") / (p("A") + p("B")) - 0.8) +
        math.abs(p("B") / (p("B") + p("C")) - 0.7) +
        math.abs(p("A") / (p("A") + p("C")) - 0.9)
    gap(p2) should be < 0.25
    gap(mm(mm(p2))) should be < gap(p2)
    // strengths normalize to 1
    s.values.sum shouldBe 1.0 +- 1e-12
    // monotone convergence of likelihood: one more round never reorders
    val p3 = mm(p2)
    (p3("A") > p3("B")) shouldBe true
    (p3("B") > p3("C")) shouldBe true
  }

  test("q346 Friedman 2x-midrank formula reproduces textbook ranks and Q") {
    // Conover's classic 3-treatment example, 4 blocks, no ties:
    // measures per block, treatments T1..T3
    val blocks = Seq(
      Seq(31.0, 27.0, 24.0),
      Seq(31.0, 28.0, 31.5),
      Seq(45.0, 29.0, 46.0),
      Seq(21.0, 18.0, 48.0))
    val k = 3; val n = blocks.size
    // mr2 = sum over the block of (2*[less] + [equal incl self]) + 1
    def mr2(block: Seq[Double], i: Int): Long =
      block.map(m => if (m < block(i)) 2L
        else if (m == block(i)) 1L else 0L).sum + 1
    // no ties -> mr2 = 2*rank
    blocks.foreach { b =>
      b.indices.map(i => mr2(b, i)).sorted shouldBe Seq(2L, 4L, 6L)
    }
    val r2 = (0 until k).map(j => blocks.map(b => mr2(b, j)).sum)
    // direct ranks: R_j = r2_j / 2
    val rj = r2.map(_ / 2.0)
    rj.sum shouldBe n * k * (k + 1) / 2.0 +- 1e-12
    val qStat = 3.0 * r2.map(v => v.toDouble * v).sum / (n * k * (k + 1)) -
      3.0 * n * (k + 1)
    val qDirect = 12.0 / (n * k * (k + 1)) * rj.map(v => v * v).sum -
      3.0 * n * (k + 1)
    qStat shouldBe qDirect +- 1e-12
    // tied block: measures (5, 5, 7) -> midranks 1.5, 1.5, 3
    val tied = Seq(5.0, 5.0, 7.0)
    tied.indices.map(i => mr2(tied, i)) shouldBe Seq(3L, 3L, 6L)
  }

  test("q347 McNemar chi-square on a hand-paired table") {
    // 100 pairs: n11=40, b=25, c=5, n00=30
    val b = 25L; val c = 5L
    val chi2 = (b - c).toDouble * (b - c) / (b + c)
    chi2 shouldBe 400.0 / 30 +- 1e-12
    val cc = (math.abs((b - c).toDouble) - 1) *
      (math.abs((b - c).toDouble) - 1) / (b + c)
    cc shouldBe 361.0 / 30 +- 1e-12
    chi2 should be > cc // continuity correction only ever shrinks
  }

  test("q343 CMH pools per-stratum odds ratios between their extremes") {
    // two strata with different ORs; the MH estimate must lie between
    val strata = Seq(
      (30L, 10L, 20L, 40L), // OR = (30*40)/(10*20) = 6
      (10L, 20L, 15L, 45L)) // OR = (10*45)/(20*15) = 1.5
    def orOf(t: (Long, Long, Long, Long)) =
      t._1.toDouble * t._4 / (t._2.toDouble * t._3)
    val num = strata.map { case (a, bb, cc2, d) =>
      a.toDouble * d / (a + bb + cc2 + d) }.sum
    val den = strata.map { case (a, bb, cc2, d) =>
      bb.toDouble * cc2 / (a + bb + cc2 + d) }.sum
    val orMh = num / den
    orMh should be > strata.map(orOf).min
    orMh should be < strata.map(orOf).max
    // identical strata -> OR_MH equals the common OR exactly
    val same = Seq((30L, 10L, 20L, 40L), (30L, 10L, 20L, 40L))
    val n2 = same.map { case (a, bb, cc2, d) =>
      a.toDouble * d / (a + bb + cc2 + d) }.sum
    val d2 = same.map { case (a, bb, cc2, d) =>
      bb.toDouble * cc2 / (a + bb + cc2 + d) }.sum
    n2 / d2 shouldBe 6.0 +- 1e-12
  }

  test("q344 medoid silhouette is 1 at a medoid-coincident point, 0 at " +
      "equidistance, negative past the midpoint") {
    def s(da: Double, db: Double): Double =
      if (math.max(da, db) > 0) (db - da) / math.max(da, db) else 0.0
    s(0.0, 0.4) shouldBe 1.0 +- 1e-15
    s(0.3, 0.3) shouldBe 0.0 +- 1e-15
    s(0.4, 0.2) shouldBe -0.5 +- 1e-15 // assigned medoid farther: misfit
    s(0.0, 0.0) shouldBe 0.0 +- 1e-15 // degenerate guard
    // silhouette is bounded in [-1, 1]
    for (i <- 0 to 10; j <- 0 to 10) {
      val (da, db) = (i / 10.0, j / 10.0)
      s(da, db) should be <= 1.0
      s(da, db) should be >= -1.0
    }
  }

  test("q342 PMI ratio ordering is invariant to the log transform") {
    // pmi = log2(ratio) is monotone, so ORDER BY ratio == ORDER BY pmi;
    // and the exact-in-double precondition holds for realistic counts
    val cases = Seq((50L, 100L, 200L, 100000L), (5L, 60L, 55L, 100000L))
    val ratios = cases.map { case (cab, ca, cb, nn) =>
      cab.toDouble * nn / (ca.toDouble * cb) }
    val pmis = ratios.map(r => math.log(r) / math.log(2))
    ratios.zip(pmis).sliding(2).foreach { case Seq((r1, p1), (r2, p2)) =>
      (r1 > r2) shouldBe (p1 > p2)
    }
    // products stay exactly representable: c_ab*N and c_a*c_b < 2^53
    val worst = 500000.0 * 500000.0 // sf0.1 scale bigram totals
    worst should be < math.pow(2, 53)
  }
}
