package graft

/** q487 RFF-MMD embedding drift: the oracle gate proves ENGINE AGREEMENT
  * of the generated ladder, but both engines evaluate the SAME generated
  * strings — a wrong mean-difference or a dropped 2/D factor would agree
  * with itself. This spec recomputes the one-vs-rest MMD² through an
  * independent dense path (plain Scala loops, UNROUNDED doubles, direct
  * per-group feature means — no decimal sums, no expression strings) and
  * checks the query's rounded output against it. It also sanity-checks
  * the statistic's defining property: the MMD² of a group against itself
  * is exactly 0.
  */
class MmdSpec extends SparkSpec {

  private val Dim = 64
  private val D = 8
  private val Sigma = 8.0

  // the deterministic RFF constants are part of the TEST'S DEFINITION
  // (like q485's t-points), re-derived here from their published recipe:
  // md5-seeded uniforms -> Box-Muller gaussians scaled 1/sigma
  private def u01(s: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8)
    (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(16, 8)
  }
  private def w(f: Int): Array[Double] = Array.tabulate(Dim) { i =>
    val u1 = u01(s"rffw|$f|$i|1")
    val u2 = u01(s"rffw|$f|$i|2")
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2) / Sigma
  }
  private def b(f: Int): Double = 2.0 * math.Pi * u01(s"rffb|$f")

  private def feats(emb: Array[Float]): Array[Double] =
    Array.tabulate(D) { fi =>
      val wv = w(fi + 1)
      var dot = 0.0
      var i = 0
      while (i < Dim) { dot += emb(i).toDouble * wv(i); i += 1 }
      math.cos(dot + b(fi + 1))
    }

  /** Reference one-vs-rest MMD² per label: direct unrounded means. */
  private def refMmd(rows: Seq[(Int, Array[Float])]): Map[Int, Double] = {
    val z = rows.map { case (l, e) => (l, feats(e)) }
    val labels = z.map(_._1).distinct
    labels.map { l =>
      val (in, out) = z.partition(_._1 == l)
      val mmd2 = (2.0 / D) * (0 until D).map { f =>
        val d = in.map(_._2(f)).sum / in.size -
          out.map(_._2(f)).sum / out.size
        d * d
      }.sum
      l -> mmd2
    }.toMap
  }

  test("q487 one-vs-rest MMD2 matches the independent dense reference at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = Tables.load(spark, dir, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .toSeq
    val ref = refMmd(rows)
    val got = SparkEntry.queries("q487_embedding_drift_mmd")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    got.length shouldBe ref.size
    val total = rows.size.toLong
    got.foreach { case (label, nIn, nOut, mmd2, mmd2n) =>
      val expectIn = rows.count(_._1 == label).toLong
      nIn shouldBe expectIn
      nOut shouldBe (total - expectIn)
      // query path rounds features@9 and the result@8; the reference is
      // fully unrounded — agreement to 1e-6 pins the algebra
      math.abs(mmd2 - ref(label)) should be < 1e-6
      val scaled = nIn.toDouble * nOut.toDouble / total * ref(label)
      math.abs(mmd2n - scaled) should be < 1e-4
    }
  }

  test("MMD2 of a group against an identical copy is zero") {
    // two identical samples => identical feature means => MMD² == 0
    val sample = Seq.fill(7)(Array.tabulate(Dim)(i => (i % 5 - 2).toFloat))
    val rows = sample.map((1, _)) ++ sample.map((2, _))
    val ref = refMmd(rows)
    ref(1) shouldBe 0.0 +- 1e-12
    ref(2) shouldBe 0.0 +- 1e-12
  }
}
