package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Writers
import graft.ops.{Prefix, Sampling}
import graft.text.TextAnalysis

/** The north-star training-corpus pipeline as library API: exact dedup →
  * language ID → quality scoring → serving filter, composed from the
  * oracle-checked primitives (q31–q34; the composition itself is q50).
  *
  * Scale shape (100 TB):
  *  - the input scan is spread across all cores before any per-row text
  *    work (small files otherwise arrive as ONE partition);
  *  - `normalizeText` is computed ONCE per document and reused by the
  *    dedup fingerprint and all language-marker counts — inlining it per
  *    marker generated a 35 KB codegen method the JVM refused to JIT;
  *  - dedup is a fingerprint hash-aggregation + left-semi join — the
  *    shuffle carries (hash, min_id), never document text;
  *  - [[score]] persists its output: the natural stage boundary between
  *    scoring and serving (a temp table / checkpoint on a cluster).
  *    Without a materialization boundary, PushDownPredicates folds the
  *    downstream lang/quality filter through the score aliases and lands
  *    a ~50-regex-pass predicate on the raw scan.
  */
object Corpus {

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      lang: String = "en",
      minQuality: Double = 0.5,
      outPath: Option[String] = None)

  private val langs = TextAnalysis.LangMarkers.map(_._1)

  /** Documents with the shared normalized-text column projected once
    * (`__norm`), spread across all cores.
    */
  def withNorm(docs: DataFrame, cfg: Config = Config()): DataFrame =
    graft.ops.Frames.spread(docs)
      .select(col(cfg.idCol), col(cfg.textCol),
        TextAnalysis.normalizeText(col(cfg.textCol)).as("__norm"))

  /** Exact-dedup survivors: one document (the minimum id) per normalized
    * content fingerprint. Input must come from [[withNorm]].
    */
  def dedupSurvivors(normed: DataFrame, cfg: Config = Config()): DataFrame = {
    val keep = normed
      .groupBy(md5(col("__norm").cast("binary")).as("fp"))
      .agg(min(col(cfg.idCol)).as(cfg.idCol))
      .select(cfg.idCol)
    normed.join(keep, Seq(cfg.idCol), "left_semi")
  }

  /** Survivors scored: token count, quality, and one `__score_<lang>`
    * column per known language, persisted as the scoring/serving stage
    * boundary. The caller owns the unpersist (the harness mains clear the
    * session cache per query).
    */
  def score(surv: DataFrame, cfg: Config = Config()): DataFrame = {
    val padded = surv.withColumn("__pad", TextAnalysis.padNorm(col("__norm")))
    padded.select(
      Seq(col(cfg.idCol),
        TextAnalysis.tokenCount(col(cfg.textCol)).as("n_tokens"),
        TextAnalysis.qualityScore(col(cfg.textCol)).as("quality")) ++
        langs.map(l => TextAnalysis.langScoreFromPadded(col("__pad"), l)
          .as(s"__score_$l")): _*)
      .persist()
  }

  /** Serving filter: predicted language matches and quality clears the
    * bar. Keeps (id, n_tokens, quality).
    */
  def serve(scored: DataFrame, cfg: Config = Config()): DataFrame =
    scored
      .where(TextAnalysis.langIdFromScores(
        langs.map(l => l -> col(s"__score_$l"))) === cfg.lang
        && col("quality") >= cfg.minQuality)
      .select(cfg.idCol, "n_tokens", "quality")

  /** The whole pipeline: dedup → score → filter (q50's exact semantics),
    * optionally written as parquet.
    *
    * Cache lifecycle: [[score]] persists the scoring/serving boundary.
    * When `outPath` is set, the write is the terminal action and the
    * cached blocks are released here before returning. Otherwise the
    * RETURNED FRAME READS THE CACHE — library callers own the release:
    * run the action, then `spark.catalog.clearCache()` or keep a handle
    * from [[score]] and `unpersist()` it (the harness mains clear the
    * session cache after every query for exactly this reason).
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val scored = score(dedupSurvivors(withNorm(docs, cfg), cfg), cfg)
    val out = serve(scored, cfg)
    cfg.outPath.foreach { p =>
      Writers.parquetSingleFile(out, p)
      scored.unpersist()
    }
    out
  }

  /** Training-data export: the curated corpus split train/val/test,
    * shuffled into a reproducible random order, and packed into
    * fixed-token-budget shards WITHIN each split — everything a trainer
    * needs to map (split, shard) to files. All stages are deterministic
    * functions of the data ([[graft.ops.Sampling]] md5 buckets,
    * [[graft.ops.Prefix]] parallel prefix sums), so any engine, any
    * partitioning, any retry produces the identical export.
    *
    * Output: (id, n_tokens, quality, split, cum_tokens, shard); shard
    * numbering restarts per split.
    */
  def export(docs: DataFrame, cfg: Config = Config(), trainPm: Int = 800,
             valPm: Int = 100, tokensPerShard: Long = 1 << 20,
             salt: String = ""): DataFrame = {
    val scored = score(dedupSurvivors(withNorm(docs, cfg), cfg), cfg)
    val served = serve(scored, cfg)
    // curate()'s contract: cfg.outPath receives the curated (pre-split)
    // corpus — preserved here where the pipeline is inlined for cache
    // lifecycle control.
    cfg.outPath.foreach(p => Writers.parquetSingleFile(served, p))
    val cur = Sampling.split(served, col(cfg.idCol), trainPm, valPm, salt)
      .withColumn("__sk",
        md5(concat(col(cfg.idCol).cast("string"), lit(salt))))
    val packed = Prefix.packShards(cur,
        orderCols = Seq(col("__sk"), col(cfg.idCol)),
        sizeCol = col("n_tokens"), budget = tokensPerShard,
        cum = "cum_tokens", shard = "shard", strataCols = Seq("split"))
      .drop("__sk")
    // packShards' eager materialization barrier has already consumed the
    // scored stage by the time it returns, so the cache releases here and
    // the returned frame reads the barrier, not the cache.
    scored.unpersist()
    packed
  }

  /** Token-budget curriculum selection: walk the corpus in `orderCols`
    * order (best-first; must be a unique total order) accumulating
    * `tokensCol`, and keep every document whose RUNNING total stays
    * within `budget` — "take the best N tokens", the data-constrained
    * scaling recipe's selection step. Output: input columns plus the
    * running `cum_tokens`.
    *
    * Scale: the global running sum is [[graft.ops.Prefix.runningTotal]]
    * — range-partition + parallel local sums + P-row offset prefix, so
    * NO single-partition window touches the corpus. The budget filter is
    * then embarrassingly parallel.
    */
  def budgetSelect(docs: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
                   tokensCol: org.apache.spark.sql.Column,
                   budget: Long): DataFrame =
    Prefix.runningTotal(docs, orderCols, tokensCol, out = "cum_tokens")
      .where(col("cum_tokens") <= budget)

  /** Padding-waste profile for fixed-length training batches: each
    * document rounds up to the smallest sequence length in `seqLens`
    * that fits (longer docs land in `overflowLen`), and the report gives
    * per-bucket document count, real tokens, padding tokens, and the
    * padded-slot waste ratio — the table that decides bucketed-batching
    * configs. Output: (seq_len, n_docs, total_tokens, total_padding,
    * waste_ratio).
    *
    * Scale: one projection + one hash aggregation over at most
    * |seqLens|+1 groups; integer arithmetic throughout, the ratio is a
    * single rounded division of exact sums.
    */
  def paddingWaste(docs: DataFrame, tokensCol: org.apache.spark.sql.Column,
                   seqLens: Seq[Int], overflowLen: Int): DataFrame = {
    require(seqLens.nonEmpty && seqLens == seqLens.sorted,
      s"seqLens must be ascending, got $seqLens")
    val t = tokensCol.cast("long")
    val bucket = seqLens.foldRight(lit(overflowLen.toLong)) {
      case (len, other) => when(t <= len, lit(len.toLong)).otherwise(other)
    }
    docs.select(bucket.as("seq_len"), t.as("n_tokens"))
      .groupBy("seq_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("seq_len") - col("n_tokens")).as("total_padding"))
      .withColumn("waste_ratio",
        round(col("total_padding") * lit(1.0) /
          (col("total_tokens") + col("total_padding")), 6))
  }
}
