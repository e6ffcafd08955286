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
    * ~2^-48 collision probability per pair.
    */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")
}
