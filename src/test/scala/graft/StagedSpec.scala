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
class StagedSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // All synthetic stages in this suite go to a suite-private root (the
  // graft.stage.dir system property — the same knob a deployment uses
  // via SPARK_GRAFT_STAGE_DIR) so spec fixtures never accrete into the
  // real stage root the bench warm path reads.
  private val specRoot = tmpDir("staged-spec-root")
  override def beforeAll(): Unit = { sys.props("graft.stage.dir") = specRoot }
  override def afterAll(): Unit = { val _ = sys.props.remove("graft.stage.dir") }

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

  /** Force every file and directory under `p` to mtime `t` — simulates a
    * regeneration landing within the same mtime tick as the original.
    */
  private def forceMtimes(p: java.io.File, t: Long): Unit = {
    val _ = p.setLastModified(t)
    Option(p.listFiles()).getOrElse(Array.empty)
      .foreach(c => forceMtimes(c, t))
  }

  test("an in-place regeneration at the SAME mtime still re-stages (content fingerprint)") {
    val dir = freshFixture()
    val srcDir = new java.io.File(s"$dir/lineitem.parquet")
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(srcDir.getPath).select(col("k"))
    }
    val tag = "spec3"
    Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 3
    val originalMtime = srcDir.lastModified()
    // regenerate in place, then pin every mtime (dir + children) back to
    // the original tick: a (dir-size, dir-mtime) fingerprint would bless
    // the stale rows; the content listing (part-file names carry write
    // UUIDs) must not
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir.getPath)
    forceMtimes(srcDir, originalMtime)
    val s2 = spark.newSession()
    Staged.parquet(s2, dir, tag, "lineitem")(build).count() shouldBe 4
    builds shouldBe 2
  }

  test("a builder version bump re-stages without a source change") {
    val dir = freshFixture()
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$dir/lineitem.parquet").select(col("k"))
    }
    val tag = "spec4"
    Staged.parquet(spark, dir, tag, "lineitem", version = 1)(build)
      .count() shouldBe 3
    builds shouldBe 1
    // same source, same tag, bumped builder: the old rows must not serve
    val s2 = spark.newSession()
    Staged.parquet(s2, dir, tag, "lineitem", version = 2)(build)
      .count() shouldBe 3
    builds shouldBe 2
  }

  test("two sessions staging the same (dir, tag) concurrently build once and agree") {
    val dir = freshFixture()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val tag = "spec5"
    def run(s: org.apache.spark.sql.SparkSession): Long =
      Staged.parquet(s, dir, tag, "lineitem") {
        val _ = builds.incrementAndGet()
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("k")).agg(sum(col("v")).as("s"))
      }.count()
    val s2 = spark.newSession()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (a, b) = (Future(run(spark)), Future(run(s2)))
    Await.result(a, 120.seconds) shouldBe 3
    Await.result(b, 120.seconds) shouldBe 3
    // the lock serializes the writers; the loser re-checks the marker
    // under the lock and reuses instead of interleaving an overwrite
    builds.get() shouldBe 1
  }

  test("stage root is configurable and vacuum drops only stale stages") {
    val dir = freshFixture()
    val customRoot = tmpDir("staged-root")
    sys.props("graft.stage.dir") = customRoot
    try {
      Staged.root shouldBe customRoot
      def build = spark.read.parquet(s"$dir/lineitem.parquet").select(col("k"))
      Staged.parquet(spark, dir, "spec6a", "lineitem")(build).count() shouldBe 3
      Staged.parquet(spark, dir, "spec6b", "lineitem")(build).count() shouldBe 3
      def stagedDirs() = Option(new java.io.File(customRoot).listFiles())
        .getOrElse(Array.empty).map(_.getName)
        .filter(_.startsWith("graft_staged_")).sorted.toSeq
      stagedDirs().size shouldBe 2
      // both live: vacuum is a no-op
      Staged.vacuum() shouldBe empty
      stagedDirs().size shouldBe 2
      // regenerate the source: BOTH stages go stale against the recorded
      // fingerprint, and vacuum reclaims them
      Seq((9L, 9L)).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Staged.vacuum().size shouldBe 2
      stagedDirs() shouldBe empty
      // a marker-less directory (crashed mid-staging) is also reclaimed
      val orphan = new java.io.File(customRoot, "graft_staged_orphan_00000000")
      val _ = orphan.mkdirs()
      Staged.vacuum() should contain(orphan.getPath)
    } finally {
      sys.props("graft.stage.dir") = specRoot
    }
  }

  test("vacuum between two reads in ONE session re-stages (memo purge)") {
    val dir = freshFixture()
    val customRoot = tmpDir("staged-root-memo")
    sys.props("graft.stage.dir") = customRoot
    try {
      var builds = 0
      def build = {
        builds += 1
        spark.read.parquet(s"$dir/lineitem.parquet").select(col("k"))
      }
      val tag = "spec7"
      Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 3
      builds shouldBe 1
      // go stale, vacuum reclaims — and must drop THIS session's memo so
      // the next read rebuilds instead of scanning the deleted data dir
      Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      Staged.vacuum().size shouldBe 1
      Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 2
      builds shouldBe 2
    } finally {
      sys.props("graft.stage.dir") = specRoot
    }
  }

  test("a reclaim by ANOTHER process is caught by the memo marker stat") {
    val dir = freshFixture()
    val customRoot = tmpDir("staged-root-xproc")
    sys.props("graft.stage.dir") = customRoot
    try {
      var builds = 0
      def build = {
        builds += 1
        spark.read.parquet(s"$dir/lineitem.parquet").select(col("k"))
      }
      val tag = "spec8"
      Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 3
      builds shouldBe 1
      // simulate a second process's vacuum: delete the staged dir behind
      // this session's memo (its own vacuum would have purged the memo)
      val staged = Option(new java.io.File(customRoot).listFiles())
        .getOrElse(Array.empty)
        .find(_.getName.startsWith("graft_staged_spec8")).get
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        val _ = f.delete()
      }
      rm(staged)
      // the memoized base path is gone; the cheap marker stat on reuse
      // must re-stage rather than fail the parquet scan
      Staged.parquet(spark, dir, tag, "lineitem")(build).count() shouldBe 3
      builds shouldBe 2
    } finally {
      sys.props("graft.stage.dir") = specRoot
    }
  }
}
