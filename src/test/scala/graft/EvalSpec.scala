package graft

import org.apache.spark.sql.functions._

import graft.ops.Bootstrap

/** Round-5 evaluation operators: Poisson bootstrap. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("Bootstrap CDF thresholds are the Poisson(1) CDF") {
    val t = Bootstrap.CdfThresholds
    t.size shouldBe 7
    t.head shouldBe math.exp(-1.0) +- 1e-15
    t(1) shouldBe 2 * math.exp(-1.0) +- 1e-15
    t.last should be > 0.9999
    t shouldBe t.sorted
  }

  test("Bootstrap weights are deterministic and mean ~1") {
    val df = (1 to 2000).map(i => (i.toString, 1.0)).toDF("rk", "x")
    val w1 = df.select(Bootstrap.weight(col("rk"), lit(0)).as("w"))
      .agg(sum(col("w")), avg(col("w"))).head()
    val w2 = df.select(Bootstrap.weight(col("rk"), lit(0)).as("w"))
      .agg(sum(col("w")), avg(col("w"))).head()
    w1.getLong(0) shouldBe w2.getLong(0) // same seed -> identical weights
    // Poisson(1) mean is 1; 2000 draws -> SE ~ 1/sqrt(2000) ~ 0.022
    w1.getDouble(1) shouldBe 1.0 +- 0.1
  }

  test("replicate means straddle the true mean and vary by replicate") {
    val df = (1 to 500).map(i => (i.toString, i.toDouble)).toDF("rk", "x")
    val means = Bootstrap.replicateMeans(df, col("rk"), col("x"), 50)
      .collect().map(_.getDouble(1))
    means.length shouldBe 50
    means.distinct.length should be > 1 // different replicates differ
    // true mean 250.5; bootstrap means concentrate around it
    val avg = means.sum / means.length
    avg shouldBe 250.5 +- 25.0
  }

  test("q331 PAV minimax identity equals sequential pool-adjacent-violators") {
    // iso_i = max_{j≤i} min_{k≥i} rate(j..k) is the minimax form of the
    // isotonic regression (Ayer et al. AOMS'55 §2) that q331 computes
    // with bounded bin-frame joins; this pins it against the textbook
    // sequential stack algorithm on a hand vector and a seeded sweep.
    def rate(n: Array[Long], p: Array[Long], j: Int, k: Int): Double = {
      var sn = 0L; var sp = 0L
      var t = j; while (t <= k) { sn += n(t); sp += p(t); t += 1 }
      sp.toDouble / sn
    }
    def minimax(n: Array[Long], p: Array[Long]): Array[Double] =
      n.indices.map(i =>
        (0 to i).map(j =>
          (i until n.length).map(k => rate(n, p, j, k)).min).max).toArray
    def seqPav(n: Array[Long], p: Array[Long]): Array[Double] = {
      // stack of pooled blocks (nSum, pSum, width)
      val st = scala.collection.mutable.Stack.empty[(Long, Long, Int)]
      n.indices.foreach { i =>
        var blk = (n(i), p(i), 1)
        while (st.nonEmpty &&
            st.top._2.toDouble / st.top._1 >= blk._2.toDouble / blk._1) {
          val t = st.pop()
          blk = (t._1 + blk._1, t._2 + blk._2, t._3 + blk._3)
        }
        st.push(blk)
      }
      st.toList.reverse.flatMap { case (sn, sp, w) =>
        List.fill(w)(sp.toDouble / sn)
      }.toArray
    }
    // hand vector with one violation run: rates .3, .1, .2, .4
    val n0 = Array(10L, 20L, 10L, 10L); val p0 = Array(3L, 2L, 2L, 4L)
    val iso0 = seqPav(n0, p0)
    iso0(0) shouldBe 5.0 / 30 +- 1e-15 // bins 0..1 pooled
    iso0(1) shouldBe 5.0 / 30 +- 1e-15
    iso0(2) shouldBe 0.2 +- 1e-15
    iso0(3) shouldBe 0.4 +- 1e-15
    minimax(n0, p0).zip(iso0).foreach { case (a, b) => a shouldBe b +- 1e-12 }
    // seeded sweep: 25 random weighted vectors, identity must hold on all
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val len = 2 + rnd.nextInt(7)
      val n = Array.fill(len)(1L + rnd.nextInt(9))
      val p = n.map(ni => rnd.nextLong(ni + 1))
      minimax(n, p).zip(seqPav(n, p)).foreach { case (a, b) =>
        a shouldBe b +- 1e-12
      }
    }
  }

  test("q326 Theil T decomposes additively into between + weighted within") {
    // T = Σ (x/X)·ln(n·x/X); the decomposition q326 emits must satisfy
    // T_total = Σ_g between_g + Σ_g share_g·T_within_g (Theil 1967) —
    // checked on a hand vector and a seeded sweep, plus T = 0 for
    // perfectly equal values.
    def theil(vs: Seq[Double]): Double = {
      val s = vs.sum; val m = vs.length
      vs.map(v => (v / s) * math.log(m * v / s)).sum
    }
    theil(Seq(2.0, 2.0, 2.0)) shouldBe 0.0 +- 1e-15
    def check(groups: Seq[Seq[Double]]): Unit = {
      val all = groups.flatten
      val bigX = all.sum; val n = all.length
      val between = groups.map { vs =>
        val xc = vs.sum
        (xc / bigX) * math.log((xc / bigX) / (vs.length.toDouble / n))
      }.sum
      val withinW = groups.map(vs => (vs.sum / bigX) * theil(vs)).sum
      val _ = (between + withinW) shouldBe theil(all) +- 1e-12
    }
    check(Seq(Seq(1.0, 3.0), Seq(2.0, 2.0, 4.0))) // hand vector
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val g = 2 + rnd.nextInt(4)
      check(Seq.fill(g)(Seq.fill(1 + rnd.nextInt(6))(0.5 + rnd.nextDouble() * 9)))
    }
  }
}
