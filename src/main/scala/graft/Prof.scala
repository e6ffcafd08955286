package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling main (not part of the driver contract): breaks the
  * connected-components pipeline into timed phases at an arbitrary SF.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.dedup.Dedup
    import graft.ops.Frames.materialize
    val docs = Tables.load(spark, dir, "documents")
    // warmup a scan
    docs.count()
    val rawPairs = Dedup.simhashNearDups(docs, col("doc_id"), col("text"),
      maxDist = 3, bits = 48)
    val pairs = time("pair-gen + materialize")(materialize(rawPairs))
    println("[prof] n_pairs=" + pairs.count())
    spark.catalog.clearCache()

    // replicate components() with per-round timing
    var edges = time("mirror edges")(materialize(pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))))
    var mapping: org.apache.spark.sql.DataFrame = null
    var it = 0
    var done = false
    while (!done && it < 25) {
      val labRaw = time(s"round $it labRaw")(materialize(
        edges.groupBy("src").agg(min(col("dst")).as("mn"))
          .select(col("src").as("node"), least(col("src"), col("mn")).as("lab"))))
      val lab = labRaw
        .join(labRaw.select(col("node").as("lab"), col("lab").as("lab2")), Seq("lab"))
        .select(col("node"), col("lab2").as("lab"))
      edges = time(s"round $it contract")(materialize(edges
        .join(lab.select(col("node").as("src"), col("lab").as("slab")), "src")
        .join(lab.select(col("node").as("dst"), col("lab").as("dlab")), "dst")
        .where(col("slab") =!= col("dlab"))
        .select(col("slab").as("src"), col("dlab").as("dst"))
        .distinct()))
      mapping =
        if (mapping == null) lab.select(col("node").as("id"), col("lab").as("rep"))
        else mapping
          .join(lab.select(col("node").as("rep"), col("lab")), Seq("rep"), "left")
          .select(col("id"), coalesce(col("lab"), col("rep")).as("rep"))
      done = time(s"round $it isEmpty")(edges.isEmpty)
      it += 1
    }
    time("final mapping action")(println("[prof] n_mapped=" + mapping.count()))
    spark.stop()
  }
}
