package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("warmup: docs.count")(docs.count())

    val raw = graft.dedup.Dedup.shinglesRaw(docs, col("doc_id"), col("text"), 3)
    time("shinglesRaw.count (regex+explode CPU)")(raw.count())
    time("shinglesRaw.count again (warm JIT)")(raw.count())

    val hs = graft.dedup.Dedup.shingleHashSet(docs, col("doc_id"), col("text"), 3)
    time("shingleHashSet.count (+hash +distinct)")(hs.count())

    spark.catalog.clearCache()
    time("q35 jaccardPairs cold")(
      graft.dedup.Dedup.jaccardPairs(
        graft.dedup.Dedup.shingleHashSet(docs, col("doc_id"), col("text"), 3), 0.8).count())
    spark.catalog.clearCache()
    time("q35 jaccardPairs warm")(
      graft.dedup.Dedup.jaccardPairs(
        graft.dedup.Dedup.shingleHashSet(docs, col("doc_id"), col("text"), 3), 0.8).count())

    spark.catalog.clearCache()
    time("q36 minhashNearDups cold")(
      graft.dedup.Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        n = 3, k = 8, rowsPerBand = 2, threshold = 0.8).count())
    spark.catalog.clearCache()
    time("q36 minhashNearDups warm")(
      graft.dedup.Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        n = 3, k = 8, rowsPerBand = 2, threshold = 0.8).count())

    // q52 stage breakdown
    spark.catalog.clearCache()
    val fp = graft.dedup.Dedup.simhash(docs, col("doc_id"), col("text"), bits = 24)
    time("q52a simhash fingerprints cold")(fp.count())
    time("q52a simhash fingerprints warm")(fp.count())
    time("q52 simhashNearDups cold-ish")(
      graft.dedup.Dedup.simhashNearDups(docs, col("doc_id"), col("text"),
        maxDist = 3, bits = 24).count())
    time("q52 simhashNearDups warm")(
      graft.dedup.Dedup.simhashNearDups(docs, col("doc_id"), col("text"),
        maxDist = 3, bits = 24).count())

    spark.stop()
  }
}
