package graft

import org.apache.spark.sql.functions._

/** q485 Epps-Singleton: the oracle gate proves ENGINE AGREEMENT of the
  * generated adjugate/determinant ladder, but both engines evaluate the
  * SAME generated strings — a sign error in the cofactor generation
  * would agree with itself. This spec recomputes W² through an
  * independent dense path (textbook quartiles, unrounded features, ML
  * covariances, Gaussian-elimination solve) and checks the query's
  * output against it.
  */
class EsSpec extends SparkSpec {

  /** Solve A·x = b (4×4) by Gaussian elimination with partial pivoting. */
  private def solve4(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val a = a0.map(_.clone()); val b = b0.clone(); val n = 4
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val (ta, tb) = (a(c), b(c)); a(c) = a(p); b(c) = b(p); a(p) = ta; b(p) = tb
      for (r <- c + 1 until n) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until n) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val x = new Array[Double](4)
    for (r <- n - 1 to 0 by -1) {
      var s = b(r)
      for (k <- r + 1 until n) s -= a(r)(k) * x(k)
      x(r) = s / a(r)(r)
    }
    x
  }

  /** Reference W² (uncorrected) for one event type, or None when the
    * query's own degenerate guards (σ≤0, group < 2) apply.
    */
  private def refW2(vs: Seq[(Long, Int)]): Option[Double] = {
    val n = vs.size
    val sorted = vs.map(_._1).sorted
    val q1 = sorted((n + 3) / 4 - 1).toDouble
    val q3 = sorted((3 * n + 3) / 4 - 1).toDouble
    val sigma = (q3 - q1) / 2.0
    val x = vs.filter(_._2 == 1).map(_._1.toDouble)
    val y = vs.filter(_._2 == 0).map(_._1.toDouble)
    if (sigma <= 0 || x.size < 2 || y.size < 2) return None
    val ts = Seq(0.4 / sigma, 0.8 / sigma)
    def g(v: Double): Array[Double] =
      Array(math.cos(ts(0) * v), math.sin(ts(0) * v),
        math.cos(ts(1) * v), math.sin(ts(1) * v))
    def moments(s: Seq[Double]): (Array[Double], Array[Array[Double]]) = {
      val gs = s.map(g)
      val m = Array.tabulate(4)(j => gs.map(_(j)).sum / s.size)
      val c = Array.tabulate(4, 4) { (j, k) =>
        gs.map(r => r(j) * r(k)).sum / s.size - m(j) * m(k)
      }
      (m, c)
    }
    val (mx, cx) = moments(x)
    val (my, cy) = moments(y)
    val d = Array.tabulate(4)(j => mx(j) - my(j))
    val omega = Array.tabulate(4, 4) { (j, k) =>
      (n.toDouble / x.size) * cx(j)(k) + (n.toDouble / y.size) * cy(j)(k)
    }
    val sol = solve4(omega, d)
    Some(n * d.zip(sol).map { case (a, b) => a * b }.sum)
  }

  test("q485 W2 matches an independent dense-algebra reference at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q485_epps_singleton")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        Option(r.getAs[Any]("w2")).map(_.asInstanceOf[Double]))
      .toMap
    out should not be empty
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 10000 + 0.5).cast("long")).as("v"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate.getDayOfMonth % 2,
        r.getAs[Long]("v")))
      .groupBy(_._1)
    out.foreach { case (et, w2) =>
      val ref = refW2(daily(et).map(t => (t._3, t._2)).toSeq)
      withClue(s"$et: query=$w2 ref=$ref:") {
        (w2, ref) match {
          case (Some(q), Some(r)) =>
            // the query rounds features @9 and the output @6; the
            // reference is unrounded — agree to 1e-3 relative
            math.abs(q - r) should be <= 1e-3 * math.max(1.0, math.abs(r))
          case (None, None) => succeed
          case _ => fail("one side degenerate, the other not")
        }
      }
    }
  }
}
