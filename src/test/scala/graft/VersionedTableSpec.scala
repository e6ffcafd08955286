package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.versioned.VersionedTable

/** V1–V8 laws from SURVEY.md §5.3. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame =
    Seq(("FERRARI", 4000, 2019), ("FIAT", 1200, 2019), ("FIAT", 1100, 2018))
      .toDF("Mh", "ec_cm3", "year")

  private def sortedRows(df: DataFrame) =
    df.orderBy("Mh", "ec_cm3", "year").collect().toSeq

  test("create → toDF round-trips the data; history has one CONVERT entry") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    sortedRows(t.toDF) shouldBe sortedRows(base)
    t.version shouldBe 0
    val h = t.history.collect()
    h.length shouldBe 1
    h.head.getString(1) shouldBe "CONVERT"
  }

  test("append grows history by 1 and unions rows") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    t.append(Seq(("AUDI", 2000, 2020)).toDF("Mh", "ec_cm3", "year"))
    t.version shouldBe 1
    t.toDF.count() shouldBe 4
    t.asOf(0).count() shouldBe 3
  }

  test("V7: append with mismatched schema throws; table is unchanged") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    val bad = Seq(("AUDI", "not-an-int")).toDF("Mh", "ec_cm3")
    an[IllegalArgumentException] should be thrownBy t.append(bad)
    t.version shouldBe 0
    t.toDF.count() shouldBe 3
  }

  test("V8: mergeSchema widens schema and null-pads old files") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    val wider = Seq(("AUDI", 2000, 2020, 95.5)).toDF("Mh", "ec_cm3", "year", "Ewltp")
    t.append(wider, mergeSchema = true)
    t.schema.fieldNames.toSeq shouldBe Seq("Mh", "ec_cm3", "year", "Ewltp")
    val df = t.toDF
    df.count() shouldBe 4
    df.where($"Ewltp".isNull).count() shouldBe 3
    df.where($"Mh" === "AUDI").select("Ewltp").as[Double].head() shouldBe 95.5
  }

  test("V4+V5: update is copy-on-write; asOf(pre) shows pre-update values") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    t.update($"Mh" === "FERRARI", Map("ec_cm3" -> ($"ec_cm3" + 10)))
    t.toDF.where($"Mh" === "FERRARI").select("ec_cm3").as[Int].head() shouldBe 4010
    // untouched rows unchanged, count preserved
    t.toDF.count() shouldBe 3
    t.toDF.where($"Mh" === "FIAT" && $"year" === 2019)
      .select("ec_cm3").as[Int].head() shouldBe 1200
    // time travel sees the pre-update snapshot
    t.asOf(0).where($"Mh" === "FERRARI").select("ec_cm3").as[Int].head() shouldBe 4000
  }

  test("V4: all SET expressions read the OLD row (column swap works)") {
    val t = VersionedTable.create(spark, tmpDir("vt"),
      Seq((1, 10, 20)).toDF("id", "a", "b"))
    t.update(lit(true), Map("a" -> $"b", "b" -> $"a"))
    val r = t.toDF.head()
    (r.getInt(1), r.getInt(2)) shouldBe ((20, 10)) // swapped, not duplicated
  }

  test("V4 guards: unknown SET column and type-changing SET both fail, no version committed") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    an[IllegalArgumentException] should be thrownBy
      t.update(lit(true), Map("Ec_cm3" -> lit(0))) // case typo
    an[IllegalArgumentException] should be thrownBy
      t.update(lit(true), Map("ec_cm3" -> lit("not-a-number"))) // int -> string
    t.version shouldBe 0
  }

  test("V6: restore(v) makes current == asOf(v) and appends to history") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    t.update($"Mh" === "FERRARI", Map("ec_cm3" -> ($"ec_cm3" + 10)))
    t.restore(0)
    t.version shouldBe 2
    sortedRows(t.toDF) shouldBe sortedRows(t.asOf(0))
    t.history.count() shouldBe 3
  }

  test("V2: compact rewrites to the requested file count, preserving rows") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base.repartition(3))
    t.append(Seq(("AUDI", 2000, 2020)).toDF("Mh", "ec_cm3", "year"))
    t.compact(numFiles = 1, clusterBy = Seq("Mh"))
    t.toDF.count() shouldBe 4
    t.toDF.rdd.getNumPartitions shouldBe 1
    sortedRows(t.toDF) shouldBe sortedRows(t.asOf(1))
  }

  test("V1: convert versions an existing parquet dir in place") {
    val dir = tmpDir("plain")
    base.coalesce(1).write.mode("overwrite").parquet(dir)
    val t = VersionedTable.convert(spark, dir)
    sortedRows(t.toDF) shouldBe sortedRows(base)
    VersionedTable.open(spark, dir).version shouldBe 0
  }

  test("DELETE removes only matching rows; NULL-cond rows survive; old version intact") {
    val t = VersionedTable.create(spark, tmpDir("vt"), base)
    t.delete($"Mh" === "FIAT" && $"year" === 2018)
    t.toDF.count() shouldBe 2
    t.toDF.where($"Mh" === "FIAT").count() shouldBe 1
    t.asOf(0).count() shouldBe 3
    t.history.head().getString(1) shouldBe "DELETE"
  }

  test("vacuum removes only never-committed files; every version stays readable") {
    val root = tmpDir("vt")
    val t = VersionedTable.create(spark, root, base)
    t.update($"Mh" === "FERRARI", Map("ec_cm3" -> ($"ec_cm3" + 10)))
    // simulate a crashed writer: orphan batch dir with a fake parquet file
    val orphanDir = java.nio.file.Paths.get(root, "data", "b9999-deadbeef")
    java.nio.file.Files.createDirectories(orphanDir)
    java.nio.file.Files.write(orphanDir.resolve("part-orphan.parquet"), Array[Byte](1, 2))
    val deleted = t.vacuum(minAgeMs = 0L)
    deleted shouldBe Seq("data/b9999-deadbeef/part-orphan.parquet")
    java.nio.file.Files.exists(orphanDir) shouldBe false
    // both committed versions still fully readable
    t.asOf(0).count() shouldBe 3
    t.toDF.where($"Mh" === "FERRARI").select("ec_cm3").as[Int].head() shouldBe 4010
  }

  test("open on a non-table fails fast") {
    an[Exception] should be thrownBy VersionedTable.open(spark, tmpDir("empty"))
  }

  test("changes: an append's feed is exactly the appended rows, reading only the new files") {
    val t = VersionedTable.create(spark, tmpDir("vt-cdc"), base)
    t.append(Seq(("AUDI", 2000, 2020)).toDF("Mh", "ec_cm3", "year"))
    val feed = t.changes(0, 1)
    feed.select("Mh", "_change_type").as[(String, String)].collect().toSeq shouldBe
      Seq(("AUDI", "insert"))
    // file-diff-bounded: only the appended files are scanned, not v0's
    val v0Files = t.asOf(0).inputFiles.toSet
    feed.inputFiles.toSet.intersect(v0Files) shouldBe empty
  }

  test("update rewrites only files containing matches; others carry forward") {
    val wide = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-pcow"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    val before = t.toDF.inputFiles.toSet
    t.update($"k" === 500L, Map("v" -> lit("HIT")))
    val after = t.toDF.inputFiles.toSet
    // exactly one clustered file held k=500: 9 carried forward unchanged
    (before intersect after).size shouldBe 9
    (after diff before).size should be <= 2 // the single rewritten batch
    t.toDF.where($"v" === "HIT").count() shouldBe 1
    t.toDF.count() shouldBe 1000
    // the change feed touches only the rewritten pair, not the snapshots
    val feed = t.changes(t.version - 1, t.version)
    feed.inputFiles.toSet.subsetOf((before diff after) ++ (after diff before)) shouldBe true
    feed.count() shouldBe 2
    // a no-match update commits a version without rewriting anything
    t.update($"k" === -1L, Map("v" -> lit("X")))
    t.toDF.inputFiles.toSet shouldBe after
    t.changes(t.version - 1, t.version).count() shouldBe 0
  }

  test("pruned update carries untouched manifest paths verbatim; history records file churn") {
    val wide = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-carry"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    val compactV = t.version
    val before = t.toDF.inputFiles.sorted.toSeq
    t.update($"k" === 500L, Map("v" -> lit("HIT")))
    val after = t.toDF.inputFiles.sorted.toSeq
    // object equality on the carried paths: the 9 clean files appear in
    // the new manifest as the IDENTICAL path strings, not re-listed or
    // rewritten copies
    after.filter(before.contains) shouldBe before.filter(after.contains)
    after.count(before.contains) shouldBe 9
    // history's churn columns record the write amplification: the UPDATE
    // added one rewritten batch (<=2 part files) and removed exactly the
    // one file that held k=500
    val h = t.history
      .select("version", "operation", "num_added_files", "num_removed_files")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val upd = h.last
    upd._2 shouldBe "UPDATE"
    upd._3 should be <= 2L
    upd._4 shouldBe 1L
    // the compact row shows the full rewrite it is
    h.find(_._1 == compactV).get._4 should be >= 1L
  }

  test("two racing appends both land via optimistic rebase (no lost batch)") {
    val t = VersionedTable.create(spark, tmpDir("vt-race"), base)
    // two handles on the same table, appending concurrently: both read
    // latest()=v0 before either commits (the parquet write dominates), so
    // one commit loses the no-overwrite rename race and must rebase
    val handles = Seq(
      ("AUDI", 2000, 2020) -> VersionedTable.open(spark, t.root),
      ("OPEL", 1600, 2021) -> VersionedTable.open(spark, t.root))
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = handles.map { case (row, h) =>
      Future(h.append(Seq(row).toDF("Mh", "ec_cm3", "year")))
    }
    Await.result(Future.sequence(fs), 120.seconds)
    // both batches committed: versions 1 and 2, both rows readable
    t.version shouldBe 2
    t.toDF.count() shouldBe 5
    t.toDF.where($"Mh".isin("AUDI", "OPEL")).count() shouldBe 2
    t.history.collect().map(_.getString(1)).count(_ == "APPEND") shouldBe 2
    // the rebased commit carried the winner's files: latest holds ALL
    // files of v1 plus the loser's batch
    val v1Files = t.asOf(1).inputFiles.toSet
    v1Files.subsetOf(t.toDF.inputFiles.toSet) shouldBe true
  }

  test("manifest carries stats-in-log: range scans plan without opening pruned files") {
    val t = VersionedTable.create(spark, tmpDir("vt-statslog"),
      (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("k", "v"))
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    // the manifest itself records per-file column stats
    val logDir = new java.io.File(t.root, "_graft_log")
    val manifest = logDir.listFiles.filter(_.getName.endsWith(".json"))
      .maxBy(_.getName)
    val json = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
    json should include(""""stats":{""")
    json should include(""""k":["n:""")
    json should include(""""v":["s:""")
    // the proof the read path plans from the MANIFEST, not footers:
    // physically truncate a file the range excludes — a footer-based
    // planner would crash opening it, the stats-in-log planner never
    // touches it
    val files = t.toDF.inputFiles.sorted
    val lowRows = t.scanPruned("k", 1L, 50L).count()
    val excluded = new java.io.File(new java.net.URI(files.last))
    java.nio.file.Files.write(excluded.toPath, Array[Byte](0, 1, 2))
    t.scanPruned("k", 1L, 50L).count() shouldBe lowRows
    lowRows shouldBe 50L
  }

  test("countFast answers count(*) from the manifest; legacy falls back") {
    val t = VersionedTable.create(spark, tmpDir("vt-countfast"),
      (1 to 400).map(i => (i.toLong, s"s$i")).toDF("k", "v"))
    t.countFast shouldBe 400L
    t.append((401 to 450).map(i => (i.toLong, s"s$i")).toDF("k", "v"))
    t.countFast shouldBe 450L
    t.delete($"k" > 430L)
    t.countFast shouldBe 430L
    t.countFast shouldBe t.toDF.count()
    // strip stats from the latest manifest: countFast must fall back to
    // a real count, not a wrong sum
    val logDir = new java.io.File(t.root, "_graft_log")
    val manifest = logDir.listFiles.filter(_.getName.endsWith(".json"))
      .maxBy(_.getName)
    val json = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
    java.nio.file.Files.write(manifest.toPath,
      json.replaceAll(""","stats":\{.*\}\}$""", "}").getBytes("UTF-8"))
    new java.io.File(logDir, s".${manifest.getName}.crc").delete()
    VersionedTable.open(spark, t.root).countFast shouldBe 430L
  }

  test("legacy manifests without stats still read and prune via footers") {
    val t = VersionedTable.create(spark, tmpDir("vt-legacy"),
      (1 to 100).map(i => (i.toLong, s"s$i")).toDF("k", "v"))
    t.compact(numFiles = 4, clusterBy = Seq("k"))
    // strip the stats field from the latest manifest, simulating a
    // manifest written before stats-in-log
    val logDir = new java.io.File(t.root, "_graft_log")
    val manifest = logDir.listFiles.filter(_.getName.endsWith(".json"))
      .maxBy(_.getName)
    val json = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
    val stripped = json.replaceAll(""","stats":\{.*\}\}$""", "}")
    stripped should not include """"stats""""
    java.nio.file.Files.write(manifest.toPath, stripped.getBytes("UTF-8"))
    // drop Hadoop local-FS's checksum sidecar — the out-of-band rewrite
    // above invalidates it (a real legacy manifest has a matching crc)
    new java.io.File(logDir, s".${manifest.getName}.crc").delete()
    val t2 = VersionedTable.open(spark, t.root)
    t2.scanPruned("k", 1L, 25L).count() shouldBe 25L
    t2.toDF.count() shouldBe 100L
  }

  test("racing updates never lose silently: each reported success is visible") {
    val t = VersionedTable.create(spark, tmpDir("vt-updrace"),
      (1 to 100).map(i => (i.toLong, "old")).toDF("k", "v"))
    import scala.concurrent._
    import scala.concurrent.duration._
    import scala.util.Try
    implicit val ec: ExecutionContext = ExecutionContext.global
    // two handles update DISJOINT row sets concurrently; a lost commit
    // race must THROW (updates derive their file list from the base
    // version — unlike appends they cannot rebase), never commit a
    // manifest that drops the winner's rows
    val handles = Seq(1L -> "A", 2L -> "B").map { case (m, tag) =>
      (m, tag, VersionedTable.open(spark, t.root))
    }
    val outcomes = Await.result(Future.sequence(handles.map {
      case (m, tag, h) => Future(
        (tag, Try(h.update($"k" % 10 === m, Map("v" -> lit(tag))))))
    }), 120.seconds)
    val won = outcomes.collect { case (tag, r) if r.isSuccess => tag }
    won should not be empty
    val vals = t.toDF.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // every SUCCESSFUL update's rows carry its tag; a failed one's don't
    for ((m, tag, _) <- handles) {
      val expected = if (won.contains(tag)) tag else "old"
      (1 to 100).filter(_ % 10 == m)
        .foreach(k => vals(k.toLong) shouldBe expected)
    }
    // untouched rows always survive
    vals(5L) shouldBe "old"
  }

  test("update applies under a RELATIVE table root (path qualification)") {
    val rel = s"target/vt-rel-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val t = VersionedTable.create(spark, rel, base)
      t.update($"Mh" === "FERRARI", Map("ec_cm3" -> lit(9999)))
      t.toDF.where($"ec_cm3" === 9999).count() shouldBe 1
    } finally {
      val p = new org.apache.hadoop.fs.Path(rel)
      val _ = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("upsert replaces matched keys, inserts new ones, prunes untouched files") {
    val wide = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-merge"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    val before = t.toDF.inputFiles.toSet
    val source = Seq((500L, "UPDATED"), (2000L, "INSERTED")).toDF("k", "v")
    t.upsert(source, keys = Seq("k"))
    t.toDF.count() shouldBe 1001
    t.toDF.where($"k" === 500L).select("v").as[String].head() shouldBe "UPDATED"
    t.toDF.where($"k" === 2000L).count() shouldBe 1
    // only the file holding k=500 was rewritten; 9 carried forward
    (before intersect t.toDF.inputFiles.toSet).size shouldBe 9
    t.history.head().getString(1) shouldBe "MERGE"
    // duplicate source keys are rejected (the Delta MERGE ambiguity)
    an[IllegalArgumentException] should be thrownBy
      t.upsert(Seq((1L, "a"), (1L, "b")).toDF("k", "v"), keys = Seq("k"))
  }

  test("upsert with a source above the in-list cap routes through the semi-join probe") {
    // 1500 distinct single-column keys > MaxInListKeys (1000): the probe
    // must not collect them to the driver / build a giant In predicate —
    // and the result must be identical to the small-source path
    val wide = (1 to 2000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-merge-big"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    val source = (1 to 1500).map(i => (i.toLong * 2, s"U$i")).toDF("k", "v")
    t.upsert(source, keys = Seq("k"))
    // keys 2..2000 even (1000 rows) replaced; 2002..3000 even (500) inserted
    t.toDF.count() shouldBe 2500
    t.toDF.where($"k" === 1000L).select("v").as[String].head() shouldBe "U500"
    t.toDF.where($"k" === 3000L).select("v").as[String].head() shouldBe "U1500"
    t.toDF.where($"k" === 999L).select("v").as[String].head() shouldBe "r999"
    t.toDF.groupBy("k").count().where($"count" > 1).count() shouldBe 0
  }

  test("delete rewrites only matching files") {
    val wide = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-pdel"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k"))
    val before = t.toDF.inputFiles.toSet
    t.delete($"k" >= 901L)
    t.toDF.count() shouldBe 900
    (before intersect t.toDF.inputFiles.toSet).size should be >= 8
  }

  test("scanPruned reads only the files whose stats overlap the range") {
    val wide = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val t = VersionedTable.create(spark, tmpDir("vt-prune"), wide)
    t.compact(numFiles = 10, clusterBy = Seq("k")) // range-clustered files
    val full = t.toDF.where($"k" >= 101 && $"k" <= 150)
    val pruned = t.scanPruned("k", 101L, 150L)
    pruned.collect().map(_.getLong(0)).sorted shouldBe
      full.collect().map(_.getLong(0)).sorted
    // 50 of 1000 range-sorted rows live in at most 2 of the 10 files
    pruned.inputFiles.length should be <= 2
    t.toDF.inputFiles.length shouldBe 10
    // string stats prune too
    t.scanPruned("v", "r101", "r101").collect().map(_.getString(1)) shouldBe
      Array("r101")
  }

  test("scanPruned after zorder skips files on EVERY clustered column") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val t = VersionedTable.create(spark, tmpDir("vt-zprune"), grid)
    t.zorder(numFiles = 16, cols = Seq("x", "y"), bits = 5)
    Seq("x", "y").foreach { c =>
      val pruned = t.scanPruned(c, 0L, 3L)
      pruned.count() shouldBe 32 * 4
      // Morton clustering keeps a 4-row slab of either axis out of most files
      pruned.inputFiles.length should be < 16
    }
  }

  test("changes: an update's feed is the delete+insert pair; carried-over rows cancel") {
    val t = VersionedTable.create(spark, tmpDir("vt-cdc2"), base)
    t.update($"Mh" === "FERRARI", Map("ec_cm3" -> lit(4010)))
    val feed = t.changes(0, 1)
      .select("Mh", "ec_cm3", "_change_type")
      .as[(String, Int, String)].collect().toSet
    feed shouldBe Set(
      ("FERRARI", 4000, "delete"),
      ("FERRARI", 4010, "insert"))
    // identity window: changes(v, v) is empty
    t.changes(1, 1).count() shouldBe 0
  }

  test("incremental log: deltas between checkpoints, snapshots at the interval") {
    val t = VersionedTable.create(spark, tmpDir("vt-inclog"),
      (1 to 50).map(i => (i.toLong, s"s$i")).toDF("k", "v"))
    for (b <- 1 to 12)
      t.append(Seq((1000L + b, s"b$b")).toDF("k", "v"))
    val logDir = new java.io.File(t.root, "_graft_log")
    def entryJson(v: Long): String = new String(
      java.nio.file.Files.readAllBytes(
        new java.io.File(logDir, f"v$v%08d.json").toPath), "UTF-8")
    // v0 (create) and v10 (checkpoint) are full snapshots; everything
    // between is a delta that names ONLY its own batch
    entryJson(0) should include(""""files":""")
    entryJson(10) should include(""""files":""")
    for (v <- Seq(1L, 5L, 9L, 11L, 12L)) {
      val j = entryJson(v)
      j should include(""""add":""")
      j should not include """"files":"""
    }
    // the write-amplification bound this design exists for: a routine
    // append's log entry does not grow with the table — it names one
    // file, where the checkpoint names all of them
    entryJson(12).length should be < entryJson(10).length / 2
    // resolution reproduces every version exactly (fresh handle: no
    // cache, walks snapshot + deltas)
    val t2 = VersionedTable.open(spark, t.root)
    t2.version shouldBe 12
    t2.toDF.count() shouldBe 62
    t2.asOf(0).count() shouldBe 50
    t2.asOf(9).count() shouldBe 59
    t2.asOf(11).count() shouldBe 61
    // stats-in-log survives the chain: countFast needs per-file row
    // counts for files committed across snapshot AND delta entries
    t2.countFast shouldBe 62L
    // and a delete recorded as a delta keeps history's add/remove view
    t2.delete($"k" === 1001L)
    t2.toDF.count() shouldBe 61
    val h = t2.history.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(3), r.getLong(4))).toMap
    // version 13's delta: a DELETE that removed at least the one
    // touched file and added its rewritten batch — history's
    // add/remove view works across snapshot and delta entries alike
    h(13L)._1 shouldBe "DELETE"
    h(13L)._3 should be >= 1L
    h(10L)._1 shouldBe "APPEND" // checkpoint keeps the true operation
  }

  test("disjoint concurrent UPDATEs both land; a conflicting pair fails cleanly") {
    // deterministic staging of the race via the package-private
    // stale-base entry point: all three writers derive from v1
    val t = VersionedTable.create(spark, tmpDir("vt-updrebase"),
      (1 to 100).map(i => (i.toLong, "old")).toDF("k", "v"))
    t.compact(numFiles = 4, clusterBy = Seq("k")) // v1: 4 files by k-range
    val baseV = t.version
    val h1 = VersionedTable.open(spark, t.root)
    val h2 = VersionedTable.open(spark, t.root)
    val h3 = VersionedTable.open(spark, t.root)
    // writer 1 wins outright (k<=25 lives in file 1)
    h1.updateAtVersion(baseV, $"k" <= 25L, Map("v" -> lit("A")))
    // writer 2 also derived from v1 but touches only file 4 (k>75):
    // its first commit loses the rename race shape (version taken),
    // the rebase sees its removed files still live, and it LANDS
    h2.updateAtVersion(baseV, $"k" > 75L, Map("v" -> lit("B")))
    val vals = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    (1 to 25).foreach(k => vals(k.toLong) shouldBe "A")
    (76 to 100).foreach(k => vals(k.toLong) shouldBe "B")
    (26 to 75).foreach(k => vals(k.toLong) shouldBe "old")
    t.version shouldBe baseV + 2
    // writer 3 conflicts: same stale base, touches the file writer 1
    // already rewrote — the rebase must detect the intersecting file
    // set and throw, never silently drop A's edits
    val e = the[IllegalStateException] thrownBy
      h3.updateAtVersion(baseV, $"k" <= 10L, Map("v" -> lit("C")))
    e.getMessage should include("concurrent")
    val after = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    (1 to 25).foreach(k => after(k.toLong) shouldBe "A")
    t.version shouldBe baseV + 2
  }
}
