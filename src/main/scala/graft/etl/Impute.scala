package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap imputation for event/metric tables. */
object Impute {

  /** Forward fill (last-observation-carried-forward): replace nulls in
    * `valueCols` with the most recent non-null value within the
    * partition, under the given total order. One window pass fills every
    * column — `last(ignoreNulls)` over an unbounded-preceding ROWS frame
    * is Spark's running-state form, evaluated in a single sort per
    * partition key. At scale this is one shuffle on the partition key
    * (the sort rides the shuffle); rows never widen, and a key's history
    * streams through one task in order — no driver collection, no
    * self-join. The order should be TOTAL (break ts ties with an id) or
    * fills on tied rows are nondeterministic.
    */
  def forwardFill(df: DataFrame, partitionCols: Seq[String],
                  orderCols: Seq[Column],
                  valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
