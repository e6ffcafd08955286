package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array[Byte](10, 20, 30)),
    (2L, Array.fill[Byte](250)(7)),
    (3L, Array.empty[Byte])).toDF("media_id", "payload")

  test("withDecodedMeta (stub UDF decode path) yields deterministic struct metadata") {
    val out = Multimodal.withDecodedMeta(media, $"payload")
      .select($"media_id", $"media_meta.width", $"media_meta.height",
        $"media_meta.nFrames", $"media_meta.format")
      .orderBy("media_id").collect()
    out(0).getInt(1) shouldBe (10 % 64 + 16)
    out(0).getInt(2) shouldBe (20 % 64 + 16)
    out(0).getInt(3) shouldBe 1        // 3 bytes -> 1 frame
    out(1).getInt(3) shouldBe 3        // 250 bytes -> 3 frames
    out(2).getInt(1) shouldBe 16       // empty payload -> floor dims
    out.map(_.getString(4)).distinct.toSeq shouldBe Seq("fake")
  }

  test("decode runs partition-parallel (no collect to driver)") {
    val wide = media.repartition(3)
    Multimodal.withDecodedMeta(wide, $"payload").rdd.getNumPartitions shouldBe 3
  }

  test("frameOffsets samples every stride-th offset up to maxFrames") {
    val df = Seq(Tuple1(250)).toDF("n_bytes")
    val offs = df.select(
      Multimodal.frameOffsets($"n_bytes", stride = 100, maxFrames = 5).as("o"))
      .as[Seq[Int]].head()
    offs shouldBe Seq(0, 100, 200)
  }

  test("pooledFeatures average-pools the stub-decoded grid exactly") {
    // side=2, pool=2: one output cell = avg of the 4 codepoints
    // 'a'=97 'b'=98 'c'=99 'e'=101 -> (97+98+99+101) DIV 4 = 98
    val docs = Seq((7L, "abce")).toDF("id", "payload")
    val r = Multimodal.pooledFeatures(docs, $"id", $"payload",
      side = 2, pool = 2).head()
    (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)) shouldBe
      (7L, 0, 0, 98L)
    // short payloads pad with spaces (32): 'a'=97 + 3 spaces -> 193 DIV 4 = 48
    val short = Multimodal.pooledFeatures(
      Seq((1L, "a")).toDF("id", "payload"), $"id", $"payload", 2, 2).head()
    short.getLong(3) shouldBe ((97L + 32 * 3) / 4)
    // a 4x4 grid pools to 2x2 = 4 cells
    Multimodal.pooledFeatures(
      Seq((1L, "x" * 16)).toDF("id", "payload"), $"id", $"payload", 4, 2)
      .count() shouldBe 4L
  }

  test("nativeMeta matches the stub decode for ascii payloads") {
    val docs = Seq((1L, "AB hello")).toDF("doc_id", "text")
    val r = Multimodal.nativeMeta(docs, $"text").head()
    // 'A' = 65 -> 65 % 64 + 16 = 17; 'B' = 66 -> 18
    r.getAs[Int]("width") shouldBe 17
    r.getAs[Int]("height") shouldBe 18
    r.getAs[Long]("n_bytes") shouldBe 8L
  }
}
