package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Landing-zone → raw-layer ingestion (SURVEY.md §2.1 S12, the last
  * reference surface: `data_import.ipynb.py:22-49` fetches into a
  * driver-local landing directory and promotes it to a DATED raw-layer
  * partition with `dbutils.fs.cp(file:/..., dbfs:/datalake/raw/<ds>/
  * date=<yymmdd>, recurse=True)`; `lakehouse_data_igestion.py:22-41` is
  * the same flow).
  *
  * The network fetch itself (wget/curl) is environment tooling, not
  * engine surface — what the engine owns is everything after the bytes
  * land: promotion into the dated raw layout, the landing audit, and
  * the partition-pruned read-back. All paths go through the Hadoop
  * `FileSystem` API, so a landing zone can be `file:/` (the reference's
  * driver-local dir), `hdfs:/`, or an object store, unchanged.
  */
object Ingest {

  /** Raw-layer location for one dataset landing date. */
  def rawPath(rawRoot: String, dataset: String, date: String): String =
    s"$rawRoot/$dataset/date=$date"

  /** Promote a landed file/directory into `rawRoot/<dataset>/date=<date>`
    * (the reference's `dbutils.fs.cp(..., recurse=True)` cell) and return
    * the landing audit: one (path, bytes) per landed data file.
    * Re-landing the same date replaces it — re-running a failed ingest
    * must not double the data.
    */
  def stage(spark: SparkSession, src: String, rawRoot: String,
            dataset: String, date: String): Seq[(String, Long)] = {
    require(date.matches("\\d{6}"), s"date must be yymmdd, got $date")
    val conf = Lake.conf(spark)
    val dst = rawPath(rawRoot, dataset, date)
    Lake.rm(conf, dst)
    Lake.mkdirs(conf, dst)
    // a directory source lands its CONTENTS (the reference's
    // `cp(file:/landing, .../date=x, recurse=True)` semantics) — copying
    // the directory itself would nest an unreadable extra level
    val s = new Path(src)
    val sfs = s.getFileSystem(conf)
    if (sfs.getFileStatus(s).isDirectory)
      sfs.listStatus(s).foreach(c => Lake.copy(conf, c.getPath.toString, dst))
    else Lake.copy(conf, src, dst)
    audit(spark, dst)
  }

  /** (path, bytes) for every data file under `path`, recursively —
    * the post-copy `dbutils.fs.ls` audit cell, made deterministic
    * (sorted by path). Hadoop/Spark metadata files (`_SUCCESS`,
    * `.crc`, anything `_`/`.`-prefixed — the same convention Spark's
    * own listing applies) are excluded: they are landing artifacts,
    * not data, and a zero-byte `_SUCCESS` must not fail a
    * bytes-landed audit.
    */
  def audit(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(Lake.conf(spark))
    if (!fs.exists(p)) Nil
    else {
      val it = fs.listFiles(p, /*recursive=*/ true)
      val out = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith("."))
          out += ((f.getPath.toUri.getPath, f.getLen))
      }
      out.result().sortBy(_._1)
    }
  }

  /** Read one landed date back (partition-pruned path; the raw layer is
    * date-partitioned exactly so reads touch one landing at a time).
    */
  def readLanded(spark: SparkSession, rawRoot: String, dataset: String,
                 date: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(rawPath(rawRoot, dataset, date))
}
