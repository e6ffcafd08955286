package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (SURVEY.md §2.11 D3 — absent in the reference; provided to
  * cover the category with the idiomatic Spark construct).
  *
  * `Aggregator[IN, BUF, OUT]` runs as a real partial+final aggregation:
  * the buffer merges map-side, so the shuffle carries one buffer per
  * (partition, key) — the same scale shape as built-in aggregates.
  */
object Aggregators {

  /** Weighted average: Σ(v·w) / Σ(w). Returns Double.NaN for zero total
    * weight (keeps OUT non-nullable primitive).
    */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
