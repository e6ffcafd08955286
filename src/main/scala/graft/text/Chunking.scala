package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.ops.Frames.spread

/** Token-window chunking — the sequence-preparation step a training
  * pipeline runs between curation and tokenization: split each document
  * into fixed-size overlapping token windows (context-length packing
  * feeds on these chunks; retrieval indexes embed them).
  *
  * Scale: narrow projection → one generator explode per document — no
  * shuffle at all; the chunk stream inherits the scan partitioning
  * (after a [[graft.ops.Frames.spread]] so a few huge documents cannot
  * pin one task). Output rows carry the 48-bit chunk hash, not the text,
  * when only downstream joins are needed.
  */
object Chunking {

  /** One row per (id, chunk): chunk_id (0-based), n_tokens (actual window
    * length, `<= width`), chunk text, and its 48-bit hash. Windows start
    * every `stride` tokens; the final window may be shorter. Empty
    * documents yield one empty chunk (same on the oracle side).
    */
  def chunks(df: DataFrame, idCol: Column, textCol: Column,
             width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0)
    val ws = TextAnalysis.tokens(TextAnalysis.normalizeText(textCol))
    spread(df)
      .select(idCol.as("id"), ws.as("ws"))
      .select(col("id"), col("ws"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("ws")), lit(1)), lit(stride)),
          i => concat_ws(" ", slice(col("ws"), i, lit(width))))))
      .select(col("id"), col("pos").cast("int").as("chunk_id"),
        least(lit(width), size(col("ws")) - col("pos") * stride).cast("int").as("n_tokens"),
        col("col").as("chunk"),
        Hashing.hash48(col("col")).as("chash"))
  }

  /** DuckDB CTE (oracle-side dialect) for the same chunking over a words
    * CTE `w(id, ws)`: emits `ch(id, chunk_id, n_tokens, chunk, chash)`.
    * `//` is DuckDB integer division (exact here: starts are 1 + k*stride).
    */
  def oracleCte(width: Int, stride: Int): String = {
    val chash = graft.functions.PortableSql.hexToLong("md5(chunk)", 12)
    s"""ch0 AS (
       SELECT id, CAST((pos - 1) // $stride AS INT) AS chunk_id,
         CAST(least($width, len(ws) - pos + 1) AS INT) AS n_tokens,
         array_to_string(ws[pos:pos + ${width - 1}], ' ') AS chunk
       FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws), 1), $stride)) AS pos) t),
     ch AS (SELECT *, $chash AS chash FROM ch0)"""
  }
}
