package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for the similarity/storage path: symmetric
  * per-vector int8 — the standard 4× storage cut (float32 → int8 +
  * one float scale) that keeps brute-force and IVF scans cache-friendly
  * at 100 TB (dot products on int8 with one final rescale).
  *
  * Determinism: scale = max(|v_i|)/127 (max is a comparison — exact on
  * both engines); q_i = floor(v_i/scale + 0.5) — floor-plus-half instead
  * of round() because Spark rounds HALF_UP via BigDecimal while DuckDB
  * rounds doubles half-away-from-zero in C — same IEEE double ops on
  * both engines, so the quantized codes hash-match the oracle exactly.
  * All-zero vectors (scale 0) quantize to 0.
  */
object Quantize {

  /** One row per (vec_id, pos) with the int8 code and the per-vector
    * scale: `dequantized(i) ≈ q(i) * scale`. Flat layout (not an array
    * column) so the result is oracle-hashable; [[toArrays]] re-packs.
    */
  def int8(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val scale = (array_max(transform(vecCol, x => abs(x.cast("double")))) / lit(127.0))
    df.select(idCol.as("vec_id"), scale.as("scale"),
        posexplode(vecCol).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        when(col("scale") === 0, lit(0L))
          .otherwise(floor(col("v").cast("double") / col("scale") + lit(0.5)))
          .as("q"),
        col("scale"))
  }

  /** Re-pack the flat form into (vec_id, qvec array<tinyint>, scale) for
    * storage: 64-dim int8 + one double ≈ 72 bytes/vector vs 256.
    */
  def toArrays(flat: DataFrame): DataFrame =
    flat.groupBy("vec_id", "scale")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("q")))),
        s => s.getField("q").cast("tinyint")).as("qvec"))
}
