package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 UDAF showcase — typed `Aggregator` computing the win ratio from
  * result codes ('W'/'D'/'L'/'U'), the aggregate the reference computes
  * with a pandas lambda (`examples/visualize_data.py:155-158`, A5).
  *
  * The buffer stores HALF-POINTS as a Long (W=2, D=1, L/U=0) plus the
  * count: integer addition is associative-commutative-exact, so the
  * partial-aggregation (map-side combine) Spark applies automatically
  * yields bit-identical results under any partitioning — unlike a naive
  * Double sum. Finish divides once.
  */
object WinRatioAgg extends Aggregator[String, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), result: String): (Long, Long) = {
    val half = result match {
      case "W" => 2L
      case "D" => 1L
      case _   => 0L
    }
    (b._1 + half, b._2 + 1L)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) 0.0 else b._1.toDouble / 2.0 / b._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `df.groupBy(...).agg(WinRatioAgg.column(col))`. */
  def column(resultCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(this)
      .apply(resultCol)
}
