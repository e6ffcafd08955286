package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** North-star multimodal query: documents' text treated as an opaque media
  * payload — byte length, content hash, fake decode dimensions, frame-plan
  * size. The UDF decode path is exercised in ScalaTest; this query uses the
  * native (oracle-checkable) projection.
  */
object MultimodalQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[Q] = Seq(
    Q("q40_multimodal_meta", Q.sql("""
        SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_hash,
          ascii(substr(text, 1, 1)) % 64 + 16 AS width,
          ascii(substr(text, 2, 1)) % 64 + 16 AS height,
          round((ascii(substr(text, 1, 1)) % 64 + 16) * 1.0
            / (ascii(substr(text, 2, 1)) % 64 + 16), 6) AS aspect,
          CAST(floor(strlen(text) / 100) AS INT) + 1 AS n_frames
        FROM documents
        ORDER BY doc_id"""))(
      (s, dir) =>
        Multimodal.nativeMeta(
            T(s, dir, "documents").select("doc_id", "text"), col("text"))
          .withColumn("aspect",
            round(col("width") * lit(1.0) / col("height"), 6))
          .withColumn("n_frames",
            floor(col("n_bytes") / 100).cast("int") + 1)
          .select("doc_id", "n_bytes", "content_hash", "width", "height",
            "aspect", "n_frames")
          .orderBy("doc_id")),

    // Stub-decode → RESIZE: the thumbnail/feature-extract step of a
    // media pipeline ([[Multimodal.pooledFeatures]]) — 16×16 fake-decoded
    // codepoint grid average-pooled 2×2 to an 8×8 feature map, all
    // exact integer math. The decode is the documented stub; the
    // explode/aggregate batch shape is the real pipeline (per-row grid
    // fan-out, no shuffle before the cell aggregation). 64 feature rows
    // per payload.
    Q("q301_pixel_pool", Q.sql("""
        WITH g AS (
          SELECT doc_id, pos,
            ascii(substr(rpad(text, 256, ' '), CAST(pos + 1 AS INT), 1)) AS v
          FROM documents, LATERAL (
            SELECT unnest(generate_series(0, 255)) AS pos) t)
        SELECT doc_id, CAST(pos // 32 AS INT) AS pool_y,
          CAST((pos % 16) // 2 AS INT) AS pool_x,
          CAST(sum(v) // 4 AS BIGINT) AS pool_val
        FROM g GROUP BY 1, 2, 3
        ORDER BY doc_id, pool_y, pool_x"""))(
      (s, dir) =>
        Multimodal.pooledFeatures(
            T(s, dir, "documents").select("doc_id", "text"),
            col("doc_id"), col("text"))
          .select(col("id").as("doc_id"), col("pool_y"), col("pool_x"),
            col("pool_val"))
          .orderBy("doc_id", "pool_y", "pool_x"))
  )
}
