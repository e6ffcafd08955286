package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("assign partitions every vector into exactly one of k cells") {
    val centroids = Ivf.train(emb, k = 8, iters = 2)
    centroids.length shouldBe 8
    val assigned = Ivf.assign(emb, centroids)
    assigned.count() shouldBe emb.count()
    val cells = assigned.select("cell").distinct().as[Int].collect()
    cells.foreach(c => c should (be >= 0 and be < 8))
    cells.length should be > 1 // k-means actually split the space
  }

  test("training is deterministic") {
    val c1 = Ivf.train(emb, k = 4, iters = 2)
    val c2 = Ivf.train(emb, k = 4, iters = 2)
    c1.map(_.toSeq).toSeq shouldBe c2.map(_.toSeq).toSeq
  }

  test("probe-all equals brute force exactly") {
    val centroids = Ivf.train(emb, k = 4, iters = 1)
    val queries = emb.where($"vec_id" < 5)
    val ivfAll = Ivf.knn(queries, emb, centroids, nProbe = 4, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.knnBruteForce(queries, emb, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    ivfAll shouldBe brute
  }

  test("quantized scoring with probe-all equals brute force over the codes") {
    import graft.similarity.Quantize
    val packed = Quantize.toArrays(
        Quantize.int8(emb, col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        transform(col("qvec"), x => x.cast("float")).as("qemb"))
    val joined = emb.join(packed, Seq("vec_id")).cache()
    val centroids = Ivf.train(emb, k = 4, iters = 1)
    val ivfQ = Ivf.knn(joined.where($"vec_id" < 5), joined, centroids,
        nProbe = 4, k = 3, scoreCol = "qemb")
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the SAME quantized vectors (rename to the expected col)
    val qOnly = joined.select(col("vec_id"), col("qemb").as("embedding"))
    val bruteQ = Similarity.knnBruteForce(qOnly.where($"vec_id" < 5), qOnly, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    ivfQ shouldBe bruteQ
    joined.unpersist(): Unit
  }

  test("nProbe < k trades recall for a fraction of the candidate volume") {
    val centroids = Ivf.train(emb, k = 8, iters = 2)
    val queries = emb.where($"vec_id" < 20)
    val brute = Similarity.knnBruteForce(queries, emb, k = 1)
      .where($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Ivf.knn(queries, emb, centroids, nProbe = 3, k = 1)
      .where($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val recall = brute.count { case (q, n) => ivf.get(q).contains(n) }.toDouble / brute.size
    recall should be >= 0.5 // empirically ~0.9 on the fixture; floor well below
  }
}
