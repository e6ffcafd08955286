package graft

/** Law tests for the round-9 coding/estimation batches (q350–q361):
  * textbook identities replayed in plain Scala, independent of the
  * DuckDB oracle.
  */
class CodingSpec extends SparkSpec {

  test("q354 Huffman cost sits in the Shannon band H <= bits/symbol < H+1") {
    // greedy merge cost on a known distribution, against enumerated code
    val w = Seq(45L, 13L, 12L, 16L, 9L, 5L) // classic CLRS example
    def huffmanCost(ws: Seq[Long]): Long = {
      var pool = ws.sorted
      var cost = 0L
      while (pool.size > 1) {
        val merged = pool(0) + pool(1)
        cost += merged
        pool = (merged +: pool.drop(2)).sorted
      }
      cost
    }
    val cost = huffmanCost(w)
    // CLRS 16.3: optimal code lengths 1,3,3,3,4,4 for 45,13,12,16,9,5
    val expect = 45 * 1 + 13 * 3 + 12 * 3 + 16 * 3 + 9 * 4 + 5 * 4
    cost shouldBe expect.toLong
    val n = w.sum.toDouble
    val h = w.map(x => -(x / n) * math.log(x / n) / math.log(2)).sum
    val bitsPerSym = cost / n
    bitsPerSym should be >= h
    bitsPerSym should be < h + 1
  }

  test("q354 merge tie-break (weight, then min label) is total") {
    // equal weights: the pool self-join rank must produce a unique
    // rank per entry because labels are distinct by construction
    val pool = Seq((5L, "a"), (5L, "b"), (5L, "c"))
    val ranks = pool.map { case (w, l) =>
      1 + pool.count { case (w2, l2) => w2 < w || (w2 == w && l2 < l) }
    }
    ranks.sorted shouldBe Seq(1, 2, 3)
  }

  test("q351 Good-Turing conserves total probability mass") {
    // sum over r of r*·N_r equals N − N_1·(mass moved) bookkeeping:
    // the classic identity Σ_r N_r·r* = N − N_1 + (smoothed tail), and
    // on a closed FoF table Σ_{r>=1} N_r·(r+1)N_{r+1}/N_r = Σ r·N_r
    // shifted — verify the telescoping identity directly
    val fof = Map(1L -> 10L, 2L -> 6L, 3L -> 4L, 4L -> 2L, 5L -> 1L)
    val lhs = fof.collect { case (r, nr) if fof.contains(r + 1) =>
      nr * (r + 1).toDouble * fof(r + 1) / nr
    }.sum
    val rhs = fof.collect { case (r, nr) if r >= 2 => r * nr }.sum.toDouble
    lhs shouldBe rhs +- 1e-9
  }

  test("q357 Haar energy satisfies Parseval for the unnormalized transform") {
    // For the sum/difference (unnormalized) Haar step on pairs (a,b):
    // s=a+b, d=a−b gives s²+d² = 2(a²+b²) — so total signal energy is
    // recoverable from the level energies with the 2^l weights:
    // Σ_l E_l/2^l + (final sum)²/2^L = Σ x².
    val x = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    def step(v: Seq[Long]): (Seq[Long], Seq[Long]) =
      (v.grouped(2).map(p => p(0) + p(1)).toSeq,
        v.grouped(2).map(p => p(0) - p(1)).toSeq)
    var cur = x
    var acc = 0.0
    var l = 0
    while (cur.size > 1) {
      val (s, d) = step(cur)
      l += 1
      acc += d.map(v => v.toDouble * v).sum / math.pow(2, l)
      cur = s
    }
    acc += cur.head.toDouble * cur.head / math.pow(2, l)
    acc shouldBe x.map(v => v.toDouble * v).sum +- 1e-9
  }

  test("q355 Mann-Kendall S on a strictly increasing series is n(n-1)/2 " +
      "and z flips sign under reversal") {
    val inc = Seq(1L, 2L, 5L, 7L, 11L)
    def sStat(v: Seq[Long]): Long =
      (for (i <- v.indices; j <- i + 1 until v.size)
        yield java.lang.Long.signum(v(j) - v(i)).toLong).sum
    sStat(inc) shouldBe (inc.size * (inc.size - 1) / 2).toLong
    sStat(inc.reverse) shouldBe -sStat(inc)
    // tie handling: constant series -> S = 0 and tie term removes all
    // variance (var numerator = n(n-1)(2n+5) − t(t-1)(2t+5) = 0 for one
    // tie group of size n)
    val const = Seq(4L, 4L, 4L)
    sStat(const) shouldBe 0L
    val n = 3L
    n * (n - 1) * (2 * n + 5) - n * (n - 1) * (2 * n + 5) shouldBe 0L
  }

  test("q356 Cochran's Q reduces to McNemar chi-square at k = 2") {
    // k=2: Q = (b−c)²/(b+c) — the pairing with q347. Build a small
    // incidence and compare both formulas.
    val rows = Seq((1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (1, 1), (1, 0))
    val k = 2L
    val c1 = rows.map(_._1.toLong).sum; val c2 = rows.map(_._2.toLong).sum
    val t = c1 + c2
    val scc = c1 * c1 + c2 * c2
    val srr = rows.map { case (a, b) => val r = (a + b).toLong; r * r }.sum
    val q = (k - 1).toDouble * (k * scc - t * t) / (k * t - srr)
    val b = rows.count(r => r._1 == 1 && r._2 == 0).toLong
    val c = rows.count(r => r._1 == 0 && r._2 == 1).toLong
    q shouldBe ((b - c).toDouble * (b - c) / (b + c)) +- 1e-12
  }

  test("q361 jackknife variance of a linear statistic matches the " +
      "classical SE formula") {
    // for the MEAN (a linear statistic), jackknife variance equals
    // s²/n exactly (Tukey '58) — leave-one-out over equal-size strata
    val x = Seq(2.0, 4.0, 6.0, 10.0, 3.0)
    val n = x.size
    val mean = x.sum / n
    val reps = x.indices.map(i => (x.sum - x(i)) / (n - 1))
    val rbar = reps.sum / n
    val varJack = (n - 1).toDouble / n *
      reps.map(r => (r - rbar) * (r - rbar)).sum
    val s2 = x.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    varJack shouldBe s2 / n +- 1e-12
  }
}
