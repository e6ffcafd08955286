package graft

import org.apache.spark.sql.functions._

import graft.io.Staged

/** Fixture-keyed parquet staging (io/Staged.scala): the shared-base
  * materialization the graph-query family rides. Three contracts:
  * the staged frame is row-identical to the builder's output, the
  * builder runs at most once per (session, dir, tag), a NEW session
  * reuses the on-disk files through the fingerprint marker without
  * rebuilding, and a CHANGED source re-stages instead of serving
  * stale rows.
  */
class StagedSpec extends SparkSpec {
  import spark.implicits._

  private def freshFixture(): String = {
    val dir = tmpDir("staged-fixture")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("staged frame matches the builder's rows and builds only once per session") {
    val dir = freshFixture()
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
    }
    val tag = "spec1"
    val a = Staged.parquet(spark, dir, tag, "lineitem")(build)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    builds shouldBe 1
    val b = Staged.parquet(spark, dir, tag, "lineitem")(build)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    // memo short-circuit: second call never re-enters the builder
    builds shouldBe 1
    a.toSeq shouldBe Seq((1L, 10L), (2L, 20L), (3L, 30L))
    b.toSeq shouldBe a.toSeq
  }

  test("a new session reuses the files via the marker; a changed source re-stages") {
    val dir = freshFixture()
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$dir/lineitem.parquet").select(col("k"))
    }
    val tag = "spec2"
    Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 3
    builds shouldBe 1
    // a distinct SparkSession object = a cold memo = the cross-JVM
    // path: the marker fingerprint matches, so the files are reused
    // WITHOUT re-running the builder
    val s2 = spark.newSession()
    Staged.parquet(s2, dir, tag, "lineitem")(build).count() shouldBe 3
    builds shouldBe 1
    // regenerate the source at the same path (different size/mtime):
    // the fingerprint no longer matches, so a third cold memo re-stages
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val s3 = spark.newSession()
    Staged.parquet(s3, dir, tag, "lineitem")(build).count() shouldBe 4
    builds shouldBe 2
  }
}
