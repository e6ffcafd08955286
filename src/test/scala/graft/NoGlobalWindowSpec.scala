package graft

import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.LogEvent

/** The clean-log invariant (round 6, widened round 7): NO query plans an
  * unpartitioned window. WindowExec logs "No Partition Defined" from
  * `requiredChildDistribution` at physical-planning time, so forcing
  * `executedPlan` is enough to trip it — no job needs to run. This spec
  * re-plans EVERY query in [[SparkEntry.queries]] (not an allowlist — a
  * new window-bearing query cannot escape the sweep) under a capturing
  * appender and asserts the warning never fires. A negative control
  * proves the probe itself still trips on a deliberate global window.
  */
class NoGlobalWindowSpec extends SparkSpec {

  test("EVERY declared query plans zero unpartitioned windows") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender(
        "graft-window-probe", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("No Partition Defined")) { val _ = captured.add(m) }
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
      // the whole declared surface, not an allowlist: a new window-bearing
      // query is swept the moment it is registered, with no manual step
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
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
