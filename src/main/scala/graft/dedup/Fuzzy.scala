package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): all pairs of distinct
  * strings within edit distance `maxDist`, found WITHOUT the all-pairs
  * cross join.
  *
  * Blocking: edit distance >= |len(a) - len(b)|, so only pairs whose
  * lengths differ by at most `maxDist` can match. Each string emits
  * `maxDist + 1` probe keys (its own length .. length + maxDist); an
  * equi-join on the probe key against the other side's true length
  * yields exactly the candidate pairs with 0 <= len(b) - len(a) <=
  * maxDist, each generated once. `levenshtein` (same dynamic program in
  * Spark and DuckDB) then verifies.
  *
  * Scale shape (100 TB): candidate generation is a hash equi-join on a
  * small integer key — fan-out bounded by (maxDist+1) × the size of one
  * length class, never n². Real deployments compose a second blocking
  * key (first token, phonetic code) into `band` the same way; the length
  * band is the dialect-free one both engines replay exactly. The
  * verify stage runs the O(len²) DP only on candidates.
  *
  * Determinism: levenshtein is an exact integer DP; pairs are emitted
  * with name_a < name_b, so output is set-deterministic.
  */
object Fuzzy {

  /** Distinct values of `strCol` paired within edit distance `maxDist`:
    * (name_a, name_b, dist), name_a < name_b lexicographically.
    */
  def matchPairs(df: DataFrame, strCol: Column, maxDist: Int): DataFrame = {
    val names = df.select(strCol.as("name")).where(col("name").isNotNull)
      .distinct()
    // Probe side emits (len .. len + maxDist); build side keys on its
    // true length. band = candidate partner length.
    val probe = names.select(col("name").as("name_a"),
        explode(sequence(length(col("name")),
          length(col("name")) + lit(maxDist))).as("band"))
    val build = names.select(col("name").as("name_b"),
      length(col("name")).as("band"))
    probe.join(build, "band")
      .where(col("name_a") =!= col("name_b"))
      // each unordered pair arrives once when lengths differ (shorter
      // probes longer), twice at equal length — the a < b guard both
      // dedups the equal-length case and canonicalizes order, except
      // that when len(a) < len(b) the pair arrives ONLY as (shorter,
      // longer); emit it ordered lexicographically.
      .where((length(col("name_a")) < length(col("name_b"))) ||
        (length(col("name_a")) === length(col("name_b")) &&
          col("name_a") < col("name_b")))
      .select(least(col("name_a"), col("name_b")).as("na"),
        greatest(col("name_a"), col("name_b")).as("nb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")))
      .where(col("dist") <= maxDist && col("dist") > 0)
      .select(col("na").as("name_a"), col("nb").as("name_b"), col("dist"))
  }

  /** DuckDB replay of [[matchPairs]] over CTE `from` with one column
    * `name` (pre-distinct): the naive length-filtered pair join —
    * identical RESULT, quadratic shape (fine at oracle scale).
    */
  def oracleSql(from: String, maxDist: Int): String =
    s"""SELECT least(a.name, b.name) AS name_a,
       greatest(a.name, b.name) AS name_b,
       levenshtein(a.name, b.name) AS dist
       FROM $from a JOIN $from b
         ON a.name < b.name
        AND abs(length(a.name) - length(b.name)) <= $maxDist
       WHERE levenshtein(a.name, b.name) BETWEEN 1 AND $maxDist"""
}
