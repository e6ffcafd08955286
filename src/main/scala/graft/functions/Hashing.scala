package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic hashing column builders. md5-based so every
  * derived operator (dedup joins, sampling, minhash) is bit-reproducible
  * across engines — the DuckDB oracle derives the identical values via
  * [[PortableSql.hexToLong]].
  */
object Hashing {

  /** 48-bit md5-prefix of a column as BIGINT: an 8-byte fixed-width key
    * that shuffles and compares far cheaper than the source string, with
    * ~2^-48 collision probability per pair. Digest-direct
    * ([[Md5Long.md5PrefixLong]]) — same value as
    * `conv(substring(md5(c), 1, 12), 16, 10)` without the per-row hex
    * string round-trip.
    */
  def hash48(c: Column): Column = Md5Long.md5PrefixLong(c, 0, 6)
}
