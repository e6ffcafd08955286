package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** File/table sinks with the reference's layouts (SURVEY.md §2.1 S6–S10,
  * §2.12 L1–L3).
  *
  * The reference writes curated tables as single-file parquet
  * (`curate_data.py:119-147`: `coalesce(1)` + overwrite + `saveAsTable`
  * with an explicit path), serving tables partitioned by business keys with
  * one file per partition value (`curate_data.py:220-230`:
  * `repartition('year').write.partitionBy('year')`), appends year-batches
  * (`lakehouse_data_igestion.py:159-169`) and times compute with a noop
  * sink (`udf_complex_logic.py:63-68`).
  *
  * Scale notes:
  *  - `coalesce(1)` is for small curated dimensions only — it serializes
  *    the final stage; never use on a fact table;
  *  - `repartition(partitionCols)` before `partitionBy(partitionCols)`
  *    yields one file per partition value instead of
  *    (#tasks × #values) small files — the reference's own rationale at
  *    `curate_data.py:246`. For skewed partition values add a salt column
  *    to the repartition keys;
  *  - at 100 TB, target file sizes of 128–1024 MB via
  *    `spark.sql.files.maxRecordsPerFile` rather than exact file counts.
  */
object Writers {

  /** S6: parquet overwrite at a path, optionally registered as a table
    * (`curate_data.py:121-147`). Registration uses `saveAsTable` with an
    * explicit `path` option, matching the reference's external-table style.
    */
  def parquetOverwrite(df: DataFrame, path: String,
                       table: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet").option("path", path)
    table.fold(w.save())(w.saveAsTable)
  }

  /** L1 + S6: single-file parquet for small curated tables
    * (`curate_data.py:119-123`).
    */
  def parquetSingleFile(df: DataFrame, path: String,
                        table: Option[String] = None): Unit =
    parquetOverwrite(df.coalesce(1), path, table)

  /** S7 + L2/L3: partitioned parquet, pre-repartitioned on the partition
    * keys so each partition value lands in one file
    * (`curate_data.py:220-230`, `serving_layer.py:269-282`).
    */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                         table: Option[String] = None): Unit = {
    val w = df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .partitionBy(partitionCols: _*).option("path", path)
    table.fold(w.save())(w.saveAsTable)
  }

  /** S8: append a new batch into an existing parquet dir/table
    * (`lakehouse_data_igestion.py:159-169`). For enforced/evolving appends
    * use [[graft.versioned.VersionedTable]] instead.
    */
  def parquetAppend(df: DataFrame, path: String,
                    partitionCols: Seq[String] = Nil): Unit = {
    val base =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df
    val w = base.write.mode("append").format("parquet")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  /** Bucketed table: pre-shuffled on `bucketCols` into `nBuckets` files
    * per partition, sorted within buckets. Joins/aggregations between
    * tables bucketed the same way on the join key skip the shuffle
    * entirely (no Exchange in the plan — asserted in SkewSpec). The
    * co-location strategy for repeated large-fact joins at 100 TB;
    * requires `saveAsTable` (bucket metadata lives in the catalog).
    */
  def bucketed(df: DataFrame, table: String, path: String,
               bucketCols: Seq[String], nBuckets: Int,
               sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** S10: noop sink — full compute, output discarded; the reference's
    * benchmark method (`udf_complex_logic.py:63-68`). Used by
    * [[graft.Bench]].
    */
  def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
