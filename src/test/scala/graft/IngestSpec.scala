package graft

import graft.io.{Ingest, Lake}

/** S12 landing-zone → raw-layer ingestion. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def landingWith(files: (String, String)*): String = {
    val dir = tmpDir("graft-landing")
    files.foreach { case (name, content) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, name), content)
    }
    dir
  }

  test("stage promotes a landing dir into the dated raw layer and audits it") {
    val landing = landingWith("a.csv" -> "x,y\n1,2\n", "b.csv" -> "x,y\n3,4\n")
    val rawRoot = tmpDir("graft-raw")
    val audit = Ingest.stage(spark, landing, rawRoot, "wdi", "240101")
    audit.map(_._1.split('/').last).toSet shouldBe Set("a.csv", "b.csv")
    audit.foreach { case (_, bytes) => bytes should be > 0L }
    // the audit paths live under the dated partition
    audit.foreach { case (p, _) => p should include("wdi/date=240101") }
  }

  test("re-landing a date replaces it (idempotent re-ingest)") {
    val rawRoot = tmpDir("graft-raw2")
    Ingest.stage(spark, landingWith("a.csv" -> "x\n1\n"), rawRoot, "ds", "240101")
    val audit2 = Ingest.stage(spark,
      landingWith("b.csv" -> "x\n2\n"), rawRoot, "ds", "240101")
    audit2.map(_._1.split('/').last) shouldBe Seq("b.csv")
    // and other dates are untouched
    Ingest.stage(spark, landingWith("c.csv" -> "x\n3\n"), rawRoot, "ds", "240202")
    Ingest.audit(spark, Ingest.rawPath(rawRoot, "ds", "240101"))
      .map(_._1.split('/').last) shouldBe Seq("b.csv")
  }

  test("readLanded reads one date partition back") {
    val landing = landingWith()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$landing/t.parquet")
    val rawRoot = tmpDir("graft-raw3")
    Ingest.stage(spark, s"$landing/t.parquet", rawRoot, "t", "240101")
    val back = Ingest.readLanded(spark, rawRoot, "t", "240101")
    back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((1L, "a"), (2L, "b"))
  }

  test("stage rejects a malformed date") {
    an[IllegalArgumentException] should be thrownBy
      Ingest.stage(spark, tmpDir("x"), tmpDir("y"), "ds", "2024-01-01")
  }

  test("audit of a missing path is empty, not an error") {
    Ingest.audit(spark, s"${tmpDir("gone")}/nope") shouldBe Nil
    Lake.exists(Lake.conf(spark), s"${tmpDir("gone2")}/nope") shouldBe false
  }
}
