package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: MERGE-style upsert and SCD2
  * (slowly-changing-dimension type 2) history building — what a
  * training-data lake runs every time a crawl snapshot lands on top of
  * the previous one.
  *
  * Upsert is deliberately JOIN-FREE: base and updates are unioned with a
  * source tag and the winner per key is picked by one ranking window —
  * a single shuffle on the key, no broadcast dependency on either side's
  * size, no skew sensitivity beyond the key distribution itself. The
  * classic full-outer-join formulation shuffles BOTH sides too, but then
  * pays a second pass to coalesce column-by-column; the union form keeps
  * whole rows and scales to any column count unchanged.
  */
object Merge {

  /** MERGE INTO base USING updates:
    *  - matched + delete flag  → row removed
    *  - matched, no flag       → update row replaces base row
    *  - not matched            → update row inserted
    * `updates` must carry base's columns; `deleteCol` (boolean), when
    * given, marks deletions and is not part of the output. With several
    * update rows per key the highest `versionCol` wins (ties broken by
    * nothing — feed unique versions, as any MERGE requires).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: Option[String] = None,
             deleteCol: Option[String] = None): DataFrame = {
    val outCols = base.columns.toSeq
    val del = deleteCol.map(col(_).cast("boolean")).getOrElse(lit(false))
    val u = updates
      .withColumn("__m_del", coalesce(del, lit(false)))
      .withColumn("__m_src", lit(1))
      .select(outCols.map(col) ++ Seq(col("__m_del"), col("__m_src")): _*)
    val b = base
      .withColumn("__m_del", lit(false))
      .withColumn("__m_src", lit(0))
      .select(outCols.map(col) ++ Seq(col("__m_del"), col("__m_src")): _*)
    // updates beat base; among updates, later versions beat earlier
    val order = col("__m_src").desc +:
      versionCol.map(col(_).desc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    b.unionByName(u)
      .withColumn("__m_rn", row_number().over(w))
      .filter(col("__m_rn") === 1 && !col("__m_del"))
      .select(outCols.map(col): _*)
  }

  /** Snapshot diff: classify every key of two table snapshots as
    * `added` / `removed` / `changed` / `unchanged` — the audit step a
    * lake runs before promoting a new crawl snapshot, and the input to
    * incremental downstream recomputes (process only `added`+`changed`).
    *
    * Rows are compared by an md5 fingerprint over `valueCols`, so wide
    * rows cost one digest each instead of a column-by-column comparison,
    * and the full outer join carries only (key, 16-byte digest) through
    * the shuffle — at 100 TB the shuffle is keys+digests, never document
    * payloads. The digest input is `to_json(struct(...))` with nulls
    * kept, not a separator-joined string: JSON quotes and escapes every
    * value and renders NULL as a bare `null`, so a value containing the
    * would-be separator, or literally equal to a null sentinel, cannot
    * collide with a different row — fingerprint equality is exactly
    * row equality.
    */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, keys: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame): DataFrame =
      df.select(keys.map(col) :+ md5(to_json(
        struct(valueCols.map(col): _*),
        Map("ignoreNullFields" -> "false"))).as("__fp"): _*)
    val p = fp(prev).withColumnRenamed("__fp", "__fp_p")
    val c = fp(curr).withColumnRenamed("__fp", "__fp_c")
    p.join(c, keys, "full_outer")
      .withColumn("status",
        when(col("__fp_p").isNull, lit("added"))
          .when(col("__fp_c").isNull, lit("removed"))
          .when(col("__fp_p") =!= col("__fp_c"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(keys.map(col) :+ col("status"): _*)
  }

  /** Incremental view maintenance for additive aggregates: fold a
    * change log (inserts and deletes) into a maintained `(keys, cnt,
    * sums...)` aggregate WITHOUT rescanning the base table — the delta
    * is aggregated with signed weights (+1 insert, -1 delete), unioned
    * with the previous aggregate, and re-summed per key; groups whose
    * count reaches zero disappear. Cost: one shuffle over |prev keys| +
    * |delta keys|, independent of base-table size — the point of IVM at
    * 100 TB. Only additive aggregates (count/sum, and means derived
    * from them downstream) maintain this way; min/max need the base.
    *
    * `changes` carries the key cols, `deleteCol` (boolean) and the raw
    * `sumCols`; `prev` carries keys, `cnt`, and `sum_<col>` per sumCol
    * (the shape this function returns — it composes with itself).
    */
  def maintainAgg(prev: DataFrame, changes: DataFrame, keys: Seq[String],
                  sumCols: Seq[String], deleteCol: String): DataFrame = {
    val sign = when(col(deleteCol), lit(-1L)).otherwise(lit(1L))
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("cnt"),
        sumCols.map(c => sum((col(c) * sign.cast("double"))
          .cast("decimal(28,6)")).as(s"sum_$c")): _*)
    val prevTyped = prev.select(keys.map(col) ++ (col("cnt") +:
      sumCols.map(c => col(s"sum_$c").cast("decimal(28,6)")
        .as(s"sum_$c"))): _*)
    prevTyped.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("cnt") > 0)
  }

  /** SCD2 history from a change log: for each key's change rows (ordered
    * by `effectiveCol`) emit half-open validity intervals —
    * `effective_to` = the next change's effective date (null = current
    * version, also flagged `is_current`). One window over one shuffle on
    * the key; `effectiveCol` must be unique per key (dedup change logs
    * first — two changes of the same key at the same instant have no
    * defined order in ANY SCD2 implementation).
    */
  def scd2(changes: DataFrame, keys: Seq[String],
           effectiveCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(effectiveCol))
    changes
      .withColumn("effective_to", lead(col(effectiveCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
