package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Long

/** Bloom-filter join pruning — the hand-rolled form of Spark's runtime
  * row-group filter: build a fixed-size bit set from the (small) build
  * side's join keys, push it as a scan-side predicate on the (huge)
  * probe side, then run the exact join only on survivors.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling the ~selectivity fraction that can possibly
  * match: the bloom predicate is a pure scalar expression evaluated
  * inside the probe-side scan stage (no shuffle, no broadcast of the
  * key set itself), with false positives removed by the exact join that
  * follows. The filter is `m` BITS (driver-held, e.g. 1024 = 128 bytes)
  * regardless of build-side row count — the collect is model-bounded.
  *
  * Hashes: k double-hashed probes `(h1 + i*h2) mod m` over the two
  * 48-bit md5 halves — deterministic, replayable, and the same family
  * as [[CountMin]]/minhash.
  */
object Bloom {

  final case class Filter(bits: Array[Long], m: Int, k: Int) {
    def mightContain(keyCol: Column): Column = {
      val h1 = Md5Long.md5PrefixLong(keyCol.cast("string"), 0, 6)
      val h2 = Md5Long.md5PrefixLong(keyCol.cast("string"), 6, 6)
      // one-bit masks as a literal lookup (functions.shiftleft only takes a
      // constant shift; element_at keeps the test pure-scalar/codegen)
      val masks = typedlit((0 until 64).map(1L << _))
      (0 until k).map { i =>
        val pos = (h1 + lit(i) * h2) % m
        // bit test against the literal word array: bits[pos div 64] >> (pos%64)
        // (Column./ is double division — floor keeps the word index exact)
        (element_at(typedlit(bits.toSeq), floor(pos / 64).cast("int") + 1)
          .bitwiseAND(element_at(masks, (pos % 64).cast("int") + 1)) =!= 0)
      }.reduce(_ && _)
    }
  }

  /** Build the filter from the build side's distinct `keyCol` values.
    * One aggregation to <= m distinct bit positions, then a bounded
    * collect (positions, not keys).
    */
  def build(buildSide: DataFrame, keyCol: Column, m: Int, k: Int): Filter = {
    require(m % 64 == 0 && k >= 1)
    val h1 = Md5Long.md5PrefixLong(keyCol.cast("string"), 0, 6)
    val h2 = Md5Long.md5PrefixLong(keyCol.cast("string"), 6, 6)
    val positions = buildSide
      .select(explode(array((0 until k).map(i => (h1 + lit(i) * h2) % m): _*)).as("pos"))
      .distinct()
      .collect()
      .map(_.getLong(0))
    val bits = new Array[Long](m / 64)
    positions.foreach(p => bits(p.toInt / 64) |= (1L << (p.toInt % 64)))
    Filter(bits, m, k)
  }

  /** Exact semi-join with bloom pre-pruning: probe rows failing the bloom
    * test are dropped at the scan; the semi-join removes false positives,
    * so the result is EXACTLY `probe SEMI JOIN build` (the caller's oracle
    * is the plain semi-join).
    */
  def prunedSemiJoin(probe: DataFrame, probeKey: Column,
                     build: DataFrame, buildKey: Column,
                     m: Int = 1024, k: Int = 3): DataFrame = {
    val f = Bloom.build(build, buildKey, m, k)
    probe.where(f.mightContain(probeKey))
      .join(build.select(buildKey.as("__bk")).distinct(),
        probeKey === col("__bk"), "left_semi")
  }
}
