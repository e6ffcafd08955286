package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.io.{Lake, Readers, Writers}

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("csvQuoted round-trips headers and embedded quotes") {
    val dir = tmpDir("csv")
    Files.write(Paths.get(dir, "t.csv"),
      "Country Name,Code\n\"says \"\"hi\"\"\",AB\nplain,CD\n".getBytes)
    val df = Readers.csvQuoted(spark, s"$dir/t.csv")
    df.columns.toSeq shouldBe Seq("Country Name", "Code")
    df.where($"Code" === "AB").select("Country Name").as[String].head() shouldBe
      "says \"hi\""
  }

  test("jsonMultiline reads a pretty-printed array") {
    val dir = tmpDir("json")
    Files.write(Paths.get(dir, "t.json"),
      """[
        |  {"MS": "DE", "v": 1},
        |  {"MS": "FR", "v": 2}
        |]""".stripMargin.getBytes)
    val df = Readers.jsonMultiline(spark, s"$dir/t.json")
    df.count() shouldBe 2
    df.columns.sorted.toSeq shouldBe Seq("MS", "v")
  }

  test("parquetPartitioned writes one file per partition value and prunes") {
    val dir = tmpDir("part") + "/t"
    val df = Seq((2018, "a"), (2018, "b"), (2019, "c")).toDF("year", "v")
    Writers.parquetPartitioned(df, dir, Seq("year"))
    // layout: year=2018/ and year=2019/, one parquet file each
    val files2018 = Lake.ls(Lake.conf(spark), s"$dir/year=2018")
      .filter(_.endsWith(".parquet"))
    files2018.size shouldBe 1
    // partition pruning visible in the physical plan
    val pruned = Readers.parquetPartition(spark, dir, "year", 2019)
    pruned.count() shouldBe 1
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should (include("year#") and include("2019"))
  }

  test("parquetAppend adds a batch without touching existing data") {
    val dir = tmpDir("app") + "/t"
    Writers.parquetOverwrite(Seq((1, "a")).toDF("k", "v"), dir)
    Writers.parquetAppend(Seq((2, "b")).toDF("k", "v"), dir)
    Readers.parquet(spark, dir).count() shouldBe 2
  }

  test("parquetOverwrite with table registers an external table in the catalog") {
    val dir = tmpDir("tbl") + "/t"
    graft.io.Catalog.createDatabase(spark, "graft_test")
    Writers.parquetOverwrite(Seq((1, "a")).toDF("k", "v"), dir,
      table = Some("graft_test.t1"))
    graft.io.Catalog.tableExists(spark, "graft_test.t1") shouldBe true
    spark.table("graft_test.t1").count() shouldBe 1
    // SHOW TABLES includes the session's temp views (SQL semantics —
    // other suites share this session and legitimately leave views);
    // the assertion is about the DATABASE's persistent tables only
    graft.io.Catalog.showTables(spark, "graft_test")
      .where(!col("isTemporary")).count() shouldBe 1
    graft.io.Catalog.dropDatabase(spark, "graft_test")
  }

  test("Lake mkdirs/ls/rm/exists") {
    val conf = Lake.conf(spark)
    val root = tmpDir("lake")
    Lake.mkdirs(conf, s"$root/raw/a") shouldBe true
    Lake.exists(conf, s"$root/raw/a") shouldBe true
    Lake.ls(conf, s"$root/raw").map(_.split('/').last) shouldBe Seq("a")
    Lake.rm(conf, s"$root/raw") shouldBe true
    Lake.exists(conf, s"$root/raw") shouldBe false
  }
}
