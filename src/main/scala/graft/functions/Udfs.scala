package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's UDF escalation path, Scala edition (SURVEY.md §2.11).
  *
  * The reference demonstrates `decade` three ways and ranks them: native
  * functions > pandas UDF > Python row UDF (`udf_complex_logic.py:8`,
  * `:113`, `:118` — "when pandas UDFs are too slow use Scala-based
  * UDFs"). This engine IS the Scala endpoint: the same derivation exists
  * as
  *  1. a native column expression ([[graft.ops.Relational.decade]]) —
  *     participates in whole-stage codegen; the production choice;
  *  2. this Scala UDF — JVM-resident (no serialization boundary at all,
  *     unlike Python/pandas UDFs), but opaque to Catalyst: no pushdown
  *     through it, no codegen, nullability pessimism. Kept for parity and
  *     for the benchmark comparison;
  *  3. custom Catalyst expressions with `doGenCode` where built-ins can't
  *     express the op at all ([[ArrayMath]]).
  */
object Udfs {

  /** `1987 -> "1980s"` as a Scala UDF (reference D1, `udf_complex_logic
    * .py:50-57`).
    */
  val decadeUdf = udf((year: Int) => s"${year / 10 * 10}s")

  def decadeViaUdf(year: Column): Column = decadeUdf(year)
}
