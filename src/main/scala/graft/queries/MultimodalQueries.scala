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
          .orderBy("doc_id"))
  )
}
