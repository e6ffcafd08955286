package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Long

/** Count-min sketch: a fixed-size (d rows × w columns) matrix of counters
  * that answers frequency queries with one-sided error (estimate >= truth,
  * over-count bounded by N/w per row, min over d rows).
  *
  * Reference analogy: the reference profiles frequencies exactly
  * (`data_profiling_and_stats.py` describe/groupBy paths); the sketch is
  * the sublinear-memory form a 100 TB pipeline uses when the key
  * cardinality (token vocabulary, URL set) dwarfs executor memory.
  *
  * Scale design:
  *  - the sketch build is ONE map-side-combined aggregation producing at
  *    most d*w rows (fixed, e.g. 4*64 = 256) — the shuffle is bounded by
  *    the sketch size, never the stream;
  *  - sketches are mergeable (cell-wise +) across partitions/days by
  *    construction, like [[Hll]] registers;
  *  - probes join a (small) candidate set against the tiny cell table.
  *
  * Determinism: the d row-hashes are the double-hashing family
  * `(h1 + r*h2) mod w` over the two 48-bit md5 halves — the same
  * construction as the minhash permutations, replayable in DuckDB SQL
  * ([[graft.functions.PortableSql.hexToLong]]).
  */
object CountMin {

  /** h1/h2: independent 48-bit halves of md5(key). */
  def h1(c: Column): Column = Md5Long.md5PrefixLong(c, 0, 6)
  def h2(c: Column): Column = Md5Long.md5PrefixLong(c, 6, 6)

  /** The (row, col, cnt) cell table of the sketch over `keyCol` stream
    * rows (multiplicity counts — pass raw occurrences, not a distinct
    * set). d*w result rows; one aggregation.
    */
  def cells(stream: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    val rows = explode(sequence(lit(0), lit(d - 1))).as("r")
    stream
      .select(h1(keyCol).as("h1"), h2(keyCol).as("h2"))
      .select(rows, col("h1"), col("h2"))
      .groupBy(col("r"), ((col("h1") + col("r") * col("h2")) % w).as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate frequencies for `candidates` (a frame with `keyName`):
    * min over the d cells each key hashes to. The cell table is at most
    * d*w rows — broadcast it so the probe never shuffles.
    */
  def estimate(candidates: DataFrame, keyName: String,
               sketch: DataFrame, d: Int, w: Int): DataFrame = {
    val k = col(keyName)
    val probes = candidates
      .select(col("*"), h1(k).as("h1"), h2(k).as("h2"))
      .select(col("*"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("c", (col("h1") + col("r") * col("h2")) % w)
      .drop("h1", "h2")
    probes.join(broadcast(sketch), Seq("r", "c"))
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(col("cnt")).as("cm_est"))
  }

  /** Oracle SQL for the same double-hash cell coordinates over a key
    * expression (`(h1 + r*h2) % w`, r from a provided alias).
    */
  def cellSql(keyExpr: String, rExpr: String, w: Int): String = {
    val a = graft.functions.PortableSql.hexToLong(s"md5($keyExpr)", 12)
    val b = graft.functions.PortableSql.hexToLong(s"substr(md5($keyExpr), 13, 12)", 12)
    s"(($a) + $rExpr * ($b)) % $w"
  }
}
