package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark implementation plus (optionally) the
  * DuckDB-equivalent ANSI SQL the driver hash-compares against (SURVEY §5).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val impl: (SparkSession, String) => DataFrame)

object Q {
  /** Collapse a triple-quoted SQL block to a single driver-friendly line. */
  def sql(s: String): Option[String] =
    Some(s.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" "))
}
