package graft

import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.LogEvent

/** The clean-log invariant (round 6): NO query plans an unpartitioned
  * window. WindowExec logs "No Partition Defined" from
  * `requiredChildDistribution` at physical-planning time, so forcing
  * `executedPlan` is enough to trip it — no job needs to run. This spec
  * re-plans every query that carried such a window before the round-6
  * sweep (plus the round's new ones) under a capturing appender and
  * asserts the warning never fires, so the trap cannot silently return.
  */
class NoGlobalWindowSpec extends SparkSpec {

  // the 29 pre-sweep offenders (attributed by a per-query stderr sweep)
  // + round-6 additions; all batch queries, so planning is side-effect
  // cheap (versioned/ingest queries stage scratch dirs, which Verify
  // does per-round anyway)
  private val previouslyOffending = Seq(
    "q07_yoy_lag", "q57_pack_shards", "q58_shuffle_order", "q80_corpus_mix",
    "q89_sparse_cosine", "q94_oov_rate", "q136_skyline",
    "q143_cumulative_users", "q149_chi_square", "q150_ndcg",
    "q151_bootstrap_ci", "q153_skew_report", "q156_cusum",
    "q161_mutual_info", "q162_survival", "q177_heaps_law",
    "q180_zipf_slope", "q181_ks_test", "q185_rrf_fusion", "q188_gini",
    "q189_mean_shift", "q190_hill_tail", "q199_lift_rules",
    "q203_spearman", "q205_roc_auc", "q211_runs_test",
    "q236_interpolate_gaps", "q248_token_budget", "q254_batch_plan",
    "q257_record_orders", "q266_conf_dump", "q267_summary_profile",
    "q268_landing_ingest",
    // round-6 batch-2/3 queries that carry window/rank machinery: the
    // interval-coverage windows must stay PARTITIONED BY user, and the
    // RBO ranks / late-arrival high-watermark / weighted-median
    // cumulative weights must stay on the distributed prefix
    "q272_interval_coverage", "q275_rank_biased_overlap",
    "q277_late_arrival_audit", "q278_weighted_median",
    "q279_ppjoin_pairs", "q280_sorted_neighborhood",
    "q286_watermark_sweep")

  test("previously-offending queries plan zero unpartitioned windows") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender(
        "graft-window-probe", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("No Partition Defined")) captured.add(m)
      }
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender,
      org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      // negative control: a deliberately unpartitioned window MUST trip
      // the probe, or a logging rewire could make this spec silently
      // green forever
      {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        captured.clear()
        Seq(1, 2).toDF("v")
          .withColumn("rn", row_number().over(Window.orderBy($"v")))
          .queryExecution.executedPlan.toString
        withClue("probe appender no longer sees WindowExec warnings") {
          captured.isEmpty shouldBe false
        }
      }
      val dir = "/root/testdata/sf0.001"
      val offenders = previouslyOffending.flatMap { name =>
        spark.catalog.clearCache()
        captured.clear()
        // forcing the physical plan runs EnsureRequirements, which is
        // where WindowExec emits the warning
        SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        if (captured.isEmpty) None else Some(name)
      }
      offenders shouldBe empty
    } finally {
      rootCfg.removeAppender("graft-window-probe")
      ctx.updateLoggers()
      appender.stop()
    }
  }
}
