package graft

/** Worked-example vectors for the round-10 diagnostics batches
  * (q404–q420): each test replays the query's arithmetic in plain
  * Scala on a hand-checkable input and pins it against the textbook
  * definition, independent of the DuckDB oracle.
  */
class DesignSpec extends SparkSpec {

  test("q404 Moran's I is positive on region-clustered values and " +
      "negative on anti-clustered ones; Geary moves opposite") {
    // 2 regions x 2 units; contiguity = same region (w=1, i != j)
    def moranGeary(units: Seq[(Int, Double)]): (Double, Double) = {
      val k = units.size
      val xb = units.map(_._2).sum / k
      val d = units.map { case (r, x) => (r, x - xb) }
      val den = d.map { case (_, v) => v * v }.sum
      val byR = d.groupBy(_._1).values.toSeq
      val s0 = byR.map(g => g.size * (g.size - 1)).sum
      val numI = byR.map { g =>
        val s = g.map(_._2).sum; val q = g.map(v => v._2 * v._2).sum
        s * s - q
      }.sum
      val numC = byR.map { g =>
        val s = g.map(_._2).sum; val q = g.map(v => v._2 * v._2).sum
        2 * (g.size * q - s * s)
      }.sum
      ((k.toDouble / s0) * numI / den,
        ((k - 1).toDouble / (2 * s0)) * numC / den)
    }
    // clustered: region 0 holds the two low values, region 1 the highs
    val (iClustered, cClustered) =
      moranGeary(Seq((0, 1.0), (0, 2.0), (1, 9.0), (1, 10.0)))
    iClustered should be > 0.5
    cClustered should be < 0.5
    // anti-clustered: each region holds one low and one high
    val (iAnti, cAnti) =
      moranGeary(Seq((0, 1.0), (0, 10.0), (1, 2.0), (1, 9.0)))
    iAnti should be < 0.0
    cAnti should be > 1.0
  }

  test("q408 Jonckheere doubled-count J* reproduces the textbook " +
      "statistic, ties counted at half weight") {
    // 3 ordered groups; perfectly increasing -> J = n1*n2 + n1*n3 + n2*n3
    val inc = Seq((1, 1.0), (1, 2.0), (2, 3.0), (2, 4.0), (3, 5.0))
    def j2(xs: Seq[(Int, Double)]): Long =
      (for (a <- xs; b <- xs if a._1 < b._1) yield {
        if (a._2 < b._2) 2L else if (a._2 == b._2) 1L else 0L
      }).sum
    j2(inc) shouldBe 2L * (2 * 2 + 2 * 1 + 2 * 1)
    // one tie across groups counts once (= half weight after the /2)
    val tied = Seq((1, 1.0), (2, 1.0))
    j2(tied) shouldBe 1L
    // null mean: E[2J] = (N^2 - sum nj^2)/2
    val n = inc.size
    val sn2 = inc.groupBy(_._1).values.map(g => g.size * g.size).sum
    val e2j = (n * n - sn2) / 2
    // the increasing arrangement maxes J, so 2J > E[2J]
    (j2(inc) > e2j) shouldBe true
  }

  test("q412 IPF sweeps hit the scaled margin exactly and preserve " +
      "total mass") {
    // 2x2 table raked to uniform column margins, observed row margins
    val n = Array(Array(10.0, 30.0), Array(20.0, 40.0))
    val total = 100.0
    val colTarget = total / 2
    val rowTarget = Array(40.0, 60.0)
    var w = n.map(_.clone())
    def colSweep(): Unit = {
      val cm = Array(w(0)(0) + w(1)(0), w(0)(1) + w(1)(1))
      for (i <- 0 to 1; j <- 0 to 1) w(i)(j) *= colTarget / cm(j)
    }
    def rowSweep(): Unit = {
      val rm = w.map(_.sum)
      for (i <- 0 to 1; j <- 0 to 1) w(i)(j) *= rowTarget(i) / rm(i)
    }
    colSweep()
    // after a column sweep the column margins are EXACT
    (w(0)(0) + w(1)(0)) shouldBe colTarget +- 1e-9
    (w(0)(1) + w(1)(1)) shouldBe colTarget +- 1e-9
    rowSweep(); colSweep(); rowSweep(); colSweep()
    // after alternating sweeps ending in a column sweep: columns exact,
    // rows near-converged (IPF geometric convergence), mass preserved
    (w(0)(0) + w(1)(0)) shouldBe colTarget +- 1e-9
    math.abs(w(0).sum - rowTarget(0)) should be < 0.5
    w.flatten.sum shouldBe total +- 1e-9
  }

  test("q413 Lindley backlog recursion on a hand-walked arrival tape") {
    // capacity 5; arrivals 7,3,9,1 -> backlog 2,0,4,0; max 4; 2 days
    val arrivals = Seq(7L, 3L, 9L, 1L)
    val cap = 5L
    val (b, mx, nd) = arrivals.foldLeft((0L, 0L, 0L)) {
      case ((b0, m0, d0), a) =>
        val nb = math.max(0L, b0 + a - cap)
        (nb, math.max(m0, nb), d0 + (if (b0 + a - cap > 0) 1 else 0))
    }
    b shouldBe 0L
    mx shouldBe 4L
    nd shouldBe 2L
    // ceil-mean capacity keeps the final backlog bounded by the spread:
    // total arrivals 20, cap*4 = 20 -> the walk must end empty for this
    // tape (work conservation with no idling before the last day)
    (arrivals.sum <= cap * arrivals.size) shouldBe true
  }

  test("q417 identical studies give Q = 0, I2 = 0; a discordant study " +
      "inflates both") {
    def meta(th: Seq[Double], v: Seq[Double]): (Double, Double) = {
      val w = v.map(1 / _)
      val tf = th.zip(w).map { case (t, ww) => t * ww }.sum / w.sum
      val q = th.zip(w).map { case (t, ww) => ww * (t - tf) * (t - tf) }.sum
      val k = th.size
      (q, math.max(0, (q - (k - 1)) / q))
    }
    val (q0, i20) = meta(Seq(1.0, 1.0, 1.0), Seq(0.1, 0.1, 0.1))
    q0 shouldBe 0.0 +- 1e-12
    i20.isNaN || i20 == 0.0 shouldBe true
    val (q1, i21) = meta(Seq(1.0, 1.0, 5.0), Seq(0.1, 0.1, 0.1))
    (q1 > 10) shouldBe true
    (i21 > 0.8) shouldBe true
  }

  test("q419 periodogram concentrates power at the generating frequency") {
    // x_t = cos(2 pi * 2t/N): all power at k=2, none at k=1,3
    val n = 30
    val xs = (1 to n).map(t => math.cos(2 * math.Pi * 2 * t / n))
    def power(k: Int): Double = {
      val a = xs.zipWithIndex.map { case (x, i) =>
        x * math.cos(2 * math.Pi * k * (i + 1) / n) }.sum
      val b = xs.zipWithIndex.map { case (x, i) =>
        x * math.sin(2 * math.Pi * k * (i + 1) / n) }.sum
      (a * a + b * b) / n
    }
    (power(2) > 100 * power(1)) shouldBe true
    (power(2) > 100 * power(3)) shouldBe true
    power(2) shouldBe (n / 4.0) +- 1e-6
  }

  test("q420 transfer entropy detects a driven chain and stays ~0 on " +
      "an independent one") {
    // y_{t+1} = x_t (fully driven); x iid-ish alternating with period 3
    val xs = (0 until 120).map(t => if (t % 3 == 0) 1 else 0)
    val ys = 0 +: xs.dropRight(1) // y lags x by one step
    def te(drv: Seq[Int], tgt: Seq[Int]): Double = {
      val triples = (0 until drv.size - 1)
        .map(t => (tgt(t + 1), tgt(t), drv(t)))
      val n = triples.size.toDouble
      val c3 = triples.groupBy(identity).view.mapValues(_.size).toMap
      val cyx = triples.groupBy(t => (t._2, t._3)).view.mapValues(_.size)
        .toMap
      val cyy = triples.groupBy(t => (t._1, t._2)).view.mapValues(_.size)
        .toMap
      val cy = triples.groupBy(_._2).view.mapValues(_.size).toMap
      c3.map { case ((yn, y, x), c) =>
        (c / n) * (math.log(c) + math.log(cy(y))
          - math.log(cyx((y, x))) - math.log(cyy((yn, y))))
      }.sum
    }
    val driven = te(xs, ys)
    (driven > 0.3) shouldBe true // near H(y') for the driven chain
    // reverse direction: y_t tells you x_t exactly one step EARLIER,
    // but x is deterministic given its own phase... use an independent
    // constant target instead for the null case
    val zs = Seq.fill(120)(0)
    math.abs(te(xs, zs)) should be < 1e-9
  }
}
