package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayMath
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("DotProduct matches hand computation in both eval paths") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    // codegen path
    df.select(ArrayMath.dot($"a", $"b").as("d")).as[Double].head() shouldBe 32.0
    // interpreted path (force eval through a non-codegen context: collect
    // the expression value via RDD map over InternalRow is overkill — use
    // a filter that Catalyst constant-folds differently instead; simplest
    // reliable check is the same expression after disabling codegen)
    withCodegenDisabled {
      df.select(ArrayMath.dot($"a", $"b").as("d")).as[Double].head() shouldBe 32.0
    }
  }

  test("DotWithConst matches DotProduct against a literal vector") {
    val w = Array(0.5, -1.0, 2.0)
    val df = Seq(Tuple1(Array(2.0f, 3.0f, 4.0f))).toDF("a")
    val viaConst = df.select(ArrayMath.dotConst($"a", w).as("d")).as[Double].head()
    viaConst shouldBe (2.0 * 0.5 + 3.0 * -1.0 + 4.0 * 2.0)
    withCodegenDisabled {
      df.select(ArrayMath.dotConst($"a", w).as("d")).as[Double].head() shouldBe viaConst
    }
  }

  test("null array propagates null, not a crash") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    df.select(ArrayMath.dot($"a", $"b").as("d")).head().isNullAt(0) shouldBe true
  }

  test("knnBruteForce returns the true nearest neighbours") {
    val out = Similarity.knnBruteForce(emb.where($"vec_id" === 0), emb, k = 2, dim = 3)
      .orderBy("rank").collect()
    // id 3 is identical (cos 1.0); id 1 is close
    out.map(_.getLong(1)).toSeq shouldBe Seq(3L, 1L)
    out.head.getDouble(2) shouldBe 1.0
  }

  test("nearDupPairs finds exactly the high-cosine pairs") {
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.95, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 3L))
    pairs should not contain ((0L, 2L))
  }

  test("knnLsh candidates are a subset of brute-force pairs and keep exact duplicates") {
    val brute = Similarity.nearDupPairs(emb, threshold = 0.95, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnLsh(emb, dim = 3, nBits = 4, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    lsh.subsetOf(brute) shouldBe true
    // identical vectors always share every bucket
    lsh should contain((0L, 3L))
  }

  test("mutualKnn keeps exactly the reciprocal top-k pairs") {
    // top-1 of 0 is 3 (cos 1.0) and vice versa; 1's top-1 is 0 but 0's
    // top-1 is NOT 1 -> only (0,3) is mutual at k=1
    val m1 = Similarity.mutualKnn(emb, k = 1, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    m1 shouldBe Set((0L, 3L))
    // every mutual pair must appear (in both directions) in the full kNN
    val k = 2
    val knn = Similarity.knnBruteForce(emb, emb, k, dim = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val m2 = Similarity.mutualKnn(emb, k, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    m2.foreach { case (a, b) =>
      knn should contain((a, b))
      knn should contain((b, a))
    }
  }

  test("annRecallLsh: identical vectors share every bucket -> recall 1") {
    val same = Seq.tabulate(5)(i => (i.toLong, Array(0.6f, 0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.annRecallLsh(same, dim = 3, nBits = 4, k = 2,
      nQueries = 3).collect()
    r.length shouldBe 3
    r.foreach { row =>
      row.getLong(1) shouldBe 2L          // n_hit == k
      row.getDouble(2) shouldBe 1.0       // recall_at_k
    }
  }

  test("annRecallLsh n_hit equals an independent topk∩candidates count") {
    val exact = Similarity.knnBruteForce(emb.where($"vec_id" < 4), emb,
        k = 2, dim = 3)
      .select($"query_id", $"neighbor_id")
    val bucketed = emb.select($"vec_id",
      Similarity.lshBucket($"embedding", 3, 4).as("bucket"))
    val cands = bucketed.select($"bucket", $"vec_id".as("query_id"))
      .join(bucketed.select($"bucket", $"vec_id".as("neighbor_id")), "bucket")
      .where($"query_id" =!= $"neighbor_id")
      .select("query_id", "neighbor_id")
    val expected = exact.join(cands, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    Similarity.annRecallLsh(emb, dim = 3, nBits = 4, k = 2, nQueries = 4)
      .collect().foreach { row =>
        row.getLong(1) shouldBe expected.getOrElse(row.getLong(0), 0L)
      }
  }

  test("topEigvec recovers a dominant axis exactly") {
    // all mass on axis 1: M = diag(1, 0, 0) -> loading (1, 0, 0), λ₁ = 1
    val axis = Seq.tabulate(4)(i => (i.toLong, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.topEigvec(axis, dim = 3).orderBy("dim").collect()
    out.map(_.getDouble(1)).toSeq shouldBe Seq(1.0, 0.0, 0.0)
    out.head.getDouble(2) shouldBe 1.0 // eigval
  }

  test("topEigvec loadings are unit-norm on mixed data") {
    val out = Similarity.topEigvec(emb, dim = 3).collect()
    val norm2 = out.map(r => r.getDouble(1) * r.getDouble(1)).sum
    norm2 shouldBe 1.0 +- 1e-4
    out.foreach(_.getDouble(2) should be > 0.0)
  }

  test("centroidDistances matches the hand-computed Euclidean distance") {
    // exact-decimal floats so the decimal routing is lossless and the
    // hand computation is bit-exact: centroid = (0.625, 0.375, 0.0)
    val vs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.5f, 0.5f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.centroidDistances(vs, $"vec_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cent = Seq(0.625, 0.375, 0.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d(v: Seq[Double]) = r6(math.sqrt(
      v.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum))
    out(0L) shouldBe d(Seq(1.0, 0.0, 0.0))
    out(1L) shouldBe d(Seq(0.5, 0.5, 0.0))
    out(2L) shouldBe d(Seq(0.0, 1.0, 0.0))
    // identical vectors 0 and 3 get identical scores
    out(0L) shouldBe out(3L)
  }

  test("PQ: codebook vectors encode to their own codes; ADC is exact there") {
    import graft.similarity.Pq
    val dim = 16
    val books = Pq.codebooks(m = 4, ks = 8, dim = dim)
    // vectors that ARE concatenations of codebook entries: encode must
    // recover the entry ids, and the ADC score of such a vector against
    // its own codes equals the (rounded-term) exact dot product
    val picks = Seq(Array(0, 1, 2, 3), Array(7, 6, 5, 4), Array(3, 3, 3, 3))
    val rows = picks.zipWithIndex.map { case (p, i) =>
      (i.toLong, p.zipWithIndex.flatMap { case (c, m) => books(m)(c) }
        .map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val codes = Pq.encode(emb, books)
    val got = codes.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((p, i) <- picks.zipWithIndex; m <- 0 until 4)
      got((i.toLong, m.toLong)) shouldBe p(m).toLong

    // each vector gets exactly one code per subspace, all within [0, ks)
    codes.count() shouldBe picks.size * 4L
    codes.where(col("code") < 0 || col("code") >= 8).count() shouldBe 0L

    val adc = Pq.adcSearch(emb.where($"vec_id" === 0), codes, books, k = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def exactAdc(q: Array[Int], c: Array[Int]) = (0 until 4).map { m =>
      r6(books(m)(q(m)).zip(books(m)(c(m))).map { case (a, b) => a * b }.sum)
    }.sum
    adc(1L) shouldBe r6(exactAdc(picks(0), picks(1))) +- 1e-9
    adc(2L) shouldBe r6(exactAdc(picks(0), picks(2))) +- 1e-9
  }

  test("UpperTriProducts emits the row-major upper triangle, codegen == interpreted") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("a")
    val expected = Seq(1.0, 2.0, 3.0, 4.0, 6.0, 9.0) // x1x1,x1x2,x1x3,x2x2,x2x3,x3x3
    df.select(ArrayMath.upperTriProducts($"a").as("p"))
      .as[Seq[Double]].head() shouldBe expected
    withCodegenDisabled {
      df.select(ArrayMath.upperTriProducts($"a").as("p"))
        .as[Seq[Double]].head() shouldBe expected
    }
    // null propagates
    Seq(Tuple1(Option.empty[Array[Float]])).toDF("a")
      .select(ArrayMath.upperTriProducts($"a").as("p"))
      .head().isNullAt(0) shouldBe true
  }

  private def withCodegenDisabled[T](body: => T): T = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.wholeStage", "true")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body finally {
      conf.set("spark.sql.codegen.wholeStage", prev)
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
