package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the corrected semantics the reference's
  * combined output implies but never implements (SURVEY §2.3 note): each
  * left row picks the LATEST right row with rightTime <= leftTime per key.
  *
  * Scale design: implemented as union + running `last(ignoreNulls)` over
  * one (key, time) window — a single sort-shuffle of |L|+|R| rows. The
  * naive range join (`l.key = r.key AND r.t <= l.t` then rank) multiplies
  * rows by the right-side history length before pruning; this form never
  * materializes that product, so it survives long histories at 100 TB.
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried onto left rows (emitted
    *                  as `asof_<col>`, null when no right row precedes)
    * @param tieBreak  extra right-side ordering for duplicate timestamps
    *                  (makes "latest" deterministic — the max wins)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val tbNames = tieBreak.indices.map(i => s"__tb$i")

    val lBase = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lTagged = (valueCols.map(c => s"__v_$c" ->
        right.schema(c).dataType) ++
      tieBreak.zip(tbNames).map { case (c, n) => n -> right.schema(c).dataType })
      .foldLeft(lBase) { case (df, (name, dt)) =>
        df.withColumn(name, lit(null).cast(dt))
      }

    val rCols = col(keyCol) +: col(rightTime).as("__t") +:
      lit(0).as("__side") +:
      (valueCols.map(c => col(c).as(s"__v_$c")) ++
        tieBreak.zip(tbNames).map { case (c, n) => col(c).as(n) })
    val rTagged = right.select(rCols: _*)
    val rAligned = lTagged.columns.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lTagged.schema(c).dataType))
    }.select(lTagged.columns.toIndexedSeq.map(col): _*)

    // Right rows sort BEFORE left rows at equal time (__side 0 < 1), so
    // the as-of is inclusive of same-timestamp metrics — pandas
    // merge_asof / DuckDB ASOF JOIN parity. Among equal-time right rows
    // the tie-break ascends, so `last` picks the max.
    //
    // All value columns are carried as ONE struct filled with a single
    // `last(ignoreNulls)` — so every asof_* value comes from the SAME
    // matched right row. (Filling each column independently would mix
    // columns from different right rows whenever the latest right row
    // holds a NULL in one of them — merge_asof carries the row wholesale,
    // nulls included.)
    val order = col("__t").asc +: col("__side").asc +: tbNames.map(col(_).asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lTagged.unionByName(rAligned)
      .withColumn("__vrow",
        when(col("__side") === 0,
          struct(valueCols.map(c => col(s"__v_$c")): _*)))
    val filled = unioned.withColumn("__vrow",
      last(col("__vrow"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1)
      .drop("__t" +: "__side" +: (tbNames ++ valueCols.map(c => s"__v_$c")): _*)
    valueCols.foldLeft(out)((df, c) =>
        df.withColumn(s"asof_$c", col("__vrow").getField(s"__v_$c")))
      .drop("__vrow")
  }
}
