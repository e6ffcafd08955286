package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star set): media payloads travel as
  * opaque `binary` columns with typed metadata alongside. The Spark-side
  * shape — schema, batching, partitioning — is real; the actual codec
  * decode is STUBBED with a deterministic fake (no image/audio libraries
  * in this environment; at deployment the stub body is replaced by a real
  * decoder, the dataflow is unchanged).
  *
  * Scale: payload bytes stay columnar in parquet; metadata extraction is a
  * narrow projection. Decode runs partition-parallel via a JVM-resident
  * Scala UDF (no Python-worker round trip — the Scala analogue of the
  * reference's pandas-UDF escalation, `udf_complex_logic.py:118`).
  */
object Multimodal {

  /** Decoded-media metadata produced by the (stubbed) decoder. */
  case class MediaMeta(width: Int, height: Int, nFrames: Int, format: String)

  /** STUB decoder: deterministic fake dimensions derived from the payload
    * bytes. Replace the body with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) at deployment; the signature and dataflow stay.
    */
  val stubDecode: Array[Byte] => MediaMeta = { bytes =>
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaMeta(
      width = b0 % 64 + 16,
      height = b1 % 64 + 16,
      nFrames = bytes.length / 100 + 1,
      format = "fake")
  }

  private val decodeUdf = udf(stubDecode)

  /** Attach decoded metadata as a struct column next to the payload. */
  def withDecodedMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("media_meta", decodeUdf(payload))

  /** Pure-native metadata (no UDF): byte length, content hash, fake
    * dimensions from the first bytes — the oracle-checkable projection
    * mirroring [[stubDecode]] for ASCII payloads.
    */
  def nativeMeta(df: DataFrame, textPayload: Column): DataFrame =
    df.select(col("*"),
      octet_length(textPayload).as("n_bytes"),
      md5(textPayload.cast("binary")).as("content_hash"),
      (ascii(substring(textPayload, 1, 1)) % 64 + 16).as("width"),
      (ascii(substring(textPayload, 2, 1)) % 64 + 16).as("height"))

  /** Deterministic frame sampling plan for a fake video payload: every
    * `stride`-th byte offset, up to `maxFrames` — the partition/batch shape
    * of a real frame sampler.
    */
  /** Stub-decode → RESIZE (average-pool) feature extraction — the
    * "thumbnail" step of a media pipeline with the codec stubbed by a
    * deterministic fake decode: the payload's first `side`² characters
    * (space-padded/truncated) are a `side`×`side` grayscale grid of
    * codepoints, pooled `pool`×`pool` by integer-average. The Spark-side
    * plumbing is the real thing — per-row grid explode (no shuffle),
    * hash aggregation to (id, pool_y, pool_x) cells — and all math is
    * exact integers, so a real decoder drops in by replacing ONE
    * projection. Output: (id, pool_y, pool_x, pool_val).
    */
  def pooledFeatures(df: DataFrame, idCol: Column, payload: Column,
                     side: Int = 16, pool: Int = 2): DataFrame = {
    require(side % pool == 0, s"side $side must be divisible by pool $pool")
    df.select(idCol.as("id"),
        rpad(payload, side * side, " ").as("padded"))
      .select(col("id"), col("padded"),
        explode(sequence(lit(0), lit(side * side - 1))).as("pos"))
      .select(col("id"),
        (col("pos") / (side * pool)).cast("int").as("pool_y"),
        ((col("pos") % side) / pool).cast("int").as("pool_x"),
        expr("ascii(substr(padded, pos + 1, 1))").as("v"))
      .groupBy("id", "pool_y", "pool_x")
      .agg(expr(s"CAST(sum(v) DIV ${pool * pool} AS BIGINT)").as("pool_val"))
  }

  def frameOffsets(nBytes: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(0), greatest(nBytes - 1, lit(0)), lit(stride)),
      1, maxFrames)
}
