package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Finite execution of a Structured-Streaming pipeline so streaming
  * operators can sit under the same DuckDB hash gate as batch queries:
  * read the fixture as a STREAM, run it with `Trigger.AvailableNow` into
  * a memory sink, and hand back the sink table as a plain DataFrame.
  *
  * `AvailableNow` processes everything available then stops — the
  * batch-bounded replay mode a backfill job uses in production. At
  * cluster scale the same pipeline runs unbounded with a real sink and a
  * durable checkpoint; nothing in the transform changes, which is the
  * point of proving it against the batch oracle here.
  *
  * Output-mode rules for finite replay:
  *  - aggregations run in `Complete` mode — in `Append`, windows close
  *    only when the WATERMARK passes them, and the watermark of the final
  *    micro-batch never advances past the last window, which would hold
  *    back the tail of the result forever;
  *  - stateless/dedup pipelines run in `Append`.
  */
object StreamRun {

  /** The events fixture as a STREAMING source, with the same
    * TIMESTAMP(NANOS) → µs normalization as [[graft.Tables.load]]
    * (streaming scans need an explicit schema, which is read from the
    * parquet footer — a metadata-only operation).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    // FileStreamSource requires a directory or a GLOB — a plain file path
    // fails ("Option 'basePath' must be a directory"). The bracket glob
    // matches exactly the one fixture file while keeping glob semantics.
    streamFrom(spark, s"$dir/events.parquet", s"$dir/[e]vents.parquet")
  }

  /** readStream over `globPath` with the schema of `schemaFrom` (or the
    * one already in hand) and the TIMESTAMP(NANOS) → µs normalization
    * shared by every events stream.
    */
  private def streamFrom(spark: SparkSession, schemaFrom: String,
                         globPath: String,
                         known: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = known.getOrElse(spark.read.parquet(schemaFrom).schema)
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(globPath))
  }

  /** Any fixture table as a STREAMING source (schema from the parquet
    * footer, bracket glob so FileStreamSource accepts the single file).
    * No timestamp normalization — use [[eventsStream]] for events.
    */
  def tableStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val src = s"$dir/$name.parquet"
    val schema = spark.read.parquet(src).schema
    spark.readStream.schema(schema)
      .parquet(s"$dir/[${name.head}]${name.tail}.parquet")
  }

  /** The events fixture as a stream PLUS a far-future sentinel event
    * (user_id = -1, year 2100): staged into a fresh temp dir so that in
    * Append mode the closing watermark advances past every REAL window —
    * without it, a bounded source's final windows sit in state forever
    * (the watermark only moves on observed event times). The sentinel's
    * own window stays unflushed; callers filter `user_id = -1` out of the
    * sink. This is the standard end-of-stream flush marker pattern for
    * replaying a finite log through append-mode event-time state.
    */
  /** Per-JVM staging namespace: unique so CONCURRENT processes sharing
    * java.io.tmpdir never clobber each other's staged files mid-stream,
    * stable within the JVM so repeated runs re-stage in place (rm-first)
    * instead of leaking a fixture copy per invocation.
    */
  private lazy val stageNs =
    s"${sys.props("java.io.tmpdir")}/graft-stream-flush-" +
      java.util.UUID.randomUUID().toString.take(8)

  def eventsStreamFlushed(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = s"$dir/events.parquet"
    val schema = spark.read.parquet(src).schema
    // md5 suffix disambiguates fixture paths the sanitizer would collide
    val tmp = s"$stageNs/${dir.replaceAll("[^A-Za-z0-9.]", "_")}-" +
      org.apache.commons.codec.digest.DigestUtils.md5Hex(dir).take(8)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val tfs = tmpPath.getFileSystem(conf)
    tfs.delete(tmpPath, true)
    org.apache.hadoop.fs.FileUtil.copy(
      new org.apache.hadoop.fs.Path(src).getFileSystem(conf), new org.apache.hadoop.fs.Path(src),
      tfs, new org.apache.hadoop.fs.Path(tmp, "events.parquet"),
      false, conf)
    // sentinel: ts in raw fixture units (2100-01-01 UTC) — ns-long or
    // µs-timestamp depending on which fixture generation is on disk
    val sentinelTs: Any = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => 4102444800000000000L
      case org.apache.spark.sql.types.TimestampNTZType =>
        java.time.LocalDateTime.of(2100, 1, 1, 0, 0, 0)
      case _ => java.time.Instant.parse("2100-01-01T00:00:00Z")
    }
    val sentinel = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(-1L, sentinelTs, -1L, "sentinel", 0.0, "{}")),
      schema)
    sentinel.write.mode("append").parquet(tmp)
    streamFrom(spark, tmp, tmp, Some(schema))
  }

  /** Run `stream` to exhaustion into an in-memory sink named `name` and
    * return the sink table. Re-runnable in one session (the previous
    * sink view is dropped first).
    */
  def runToTable(name: String, stream: DataFrame, mode: OutputMode): DataFrame = {
    val spark = stream.sparkSession
    spark.catalog.dropTempView(name)
    // Stateful operators create one state-store instance per shuffle
    // partition PER micro-batch, and each pays a commit (checkpoint
    // write) regardless of row count — at replay scale the per-partition
    // overhead dominates the actual data. 8 partitions is plenty for the
    // fixture volumes; production unbounded runs size this to the
    // cluster instead. The conf is read at query START, so the
    // set/restore brackets only this stream's lifetime.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = stream.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
