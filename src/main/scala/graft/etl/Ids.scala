package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment. */
object Ids {

  /** Partition count for the range-partition machinery, derived from the
    * input's optimizer size estimate and CLAMPED to the configured
    * `spark.sql.shuffle.partitions` ceiling (guide §2: scale-adaptive
    * partitioning — derive from input size, never a constant tuned for
    * one deployment). An explicit `repartitionByRange(N, ...)` /
    * `repartition(N, ...)` is exempt from AQE partition coalescing, so
    * the former fixed N pinned `numPartitions` tasks onto every pass of
    * frames that are often tiny (threshold sweeps, bin-stats folds,
    * per-iteration fit passes); at production scale the size estimate
    * clamps back up to the configured ceiling, so big inputs keep full
    * parallelism. Every caller's result is partition-count-INDEPENDENT
    * by contract (the plain window/aggregate form is the oracle), so
    * this changes task counts, never values.
    */
  private[graft] def adaptiveParts(df: DataFrame): Int = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // Target bytes per partition: AQE's own advisory knob (default
    // 64 MB), so one conf tunes both AQE coalescing and this machinery;
    // estimates come from file sizes × selectivity, so this is a
    // floor-setting heuristic, not an exact packing.
    val target = BigInt(math.max(1L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((est + target - 1) / target).min(BigInt(parts)).max(BigInt(1)).toInt
  }

  /** Dense, gap-free 1-based ids in the total order of `orderCols` — the
    * scale-correct zipWithIndex. `monotonically_increasing_id` is sparse
    * (partition-stamped) and a global `row_number` window collapses to
    * ONE task; this instead:
    *
    *   1. range-partitions by the order columns (sampled boundaries, the
    *      same machinery as a global sort),
    *   2. counts rows per partition — a tiny (numPartitions)-row
    *      aggregate collected to the driver,
    *   3. broadcasts the cumulative offsets back and adds them to a
    *      WITHIN-partition row_number.
    *
    * Every heavy step is distributed; the driver only ever sees one long
    * per partition. The ids are deterministic for a given dataset no
    * matter where the sampled range boundaries land, PROVIDED `orderCols`
    * is a total order (add a tiebreaker column if not — enforced
    * nowhere, documented here: with ties the assignment within the tie
    * group depends on partitioning).
    */
  def denseIds(df: DataFrame, orderCols: Seq[Column],
               idName: String = "row_id",
               scope: graft.CacheScope = graft.CacheScope.harness)
      : DataFrame = {
    val parts = adaptiveParts(df)
    // Persisted: the counts pass and the final pass MUST see the same
    // physical partitioning — re-evaluating the range shuffle twice
    // would let AQE (or fresh boundary sampling) repartition differently
    // between them, silently corrupting the offsets. The block outlives
    // this call (the returned plan reads it lazily), so it registers in
    // `scope` for the OWNER to release once the result is consumed.
    val ranged = scope.track(df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__part", spark_partition_id()))
    // Tiny driver-side step: numPartitions (partition, count) pairs.
    val counts = ranged.groupBy(col("__part")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("__part", "__off")
    val w = Window.partitionBy(col("__part")).orderBy(orderCols: _*)
    ranged.join(broadcast(offDf), "__part")
      .withColumn(idName, row_number().over(w) + col("__off"))
      .drop("__part", "__off")
  }

  /** Global RUNNING TOTAL of `value` in the total order of `orderCols` —
    * the scale-correct `sum(...).over(Window.orderBy(...))`, which Spark
    * would otherwise execute as ONE task holding the whole relation.
    * Same machinery as [[denseIds]]: range-partition by the order
    * columns, per-partition sums (numPartitions longs to the driver),
    * broadcast the cumulative offsets back, add them to a
    * WITHIN-partition running sum. Deterministic wherever the sampled
    * range boundaries land, provided `orderCols` is a total order.
    *
    * Cache lifecycle: the ranged input persists MEMORY_AND_DISK because
    * the offsets pass and the final pass must see one physical
    * partitioning, and it cannot unpersist here — the returned frame
    * still reads it lazily. The block registers in `scope`
    * ([[graft.CacheScope]]); the scope's owner releases it once the
    * result is consumed (the harness does so after every query).
    */
  def runningTotal(df: DataFrame, orderCols: Seq[Column], value: Column,
                   totalName: String = "running_total",
                   scope: graft.CacheScope = graft.CacheScope.harness)
      : DataFrame = {
    val parts = adaptiveParts(df)
    // persisted for the same reason as denseIds: the offsets pass and
    // the final pass must see one physical partitioning
    val ranged = scope.track(df.withColumn("__v", value.cast("long"))
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__part", spark_partition_id()))
    val sums = ranged.groupBy(col("__part"))
      .agg(sum(col("__v")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets = sums.map(_._1).zip(sums.map(_._2).scanLeft(0L)(_ + _))
    val offDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("__part", "__off")
    val w = Window.partitionBy(col("__part")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "__part")
      .withColumn(totalName, sum(col("__v")).over(w) + col("__off"))
      .drop("__part", "__off", "__v")
  }

  /** Multi-VALUE running totals in ONE range-partitioned pass — the
    * [[runningTotal]] machinery generalized to N value columns sharing
    * one exchange, one persisted snapshot and one driver offsets
    * round-trip. N same-order [[runningTotal]] calls would range-
    * partition, persist and scan the SAME input N times (and callers
    * needing the grand totals would pay yet another whole-frame
    * aggregate); here the driver already holds every per-partition sum,
    * so the grand totals come back for free as the second member.
    *
    * Returns (annotated frame, grand total per value column, in
    * `values` order). Semantics per column are exactly
    * [[runningTotal]]'s; cache lifecycle identical (the ranged snapshot
    * registers in `scope`).
    */
  def runningTotals(df: DataFrame, orderCols: Seq[Column],
                    values: Seq[(Column, String)],
                    scope: graft.CacheScope = graft.CacheScope.harness)
      : (DataFrame, Seq[Long]) = {
    require(values.nonEmpty, "runningTotals: need at least one value")
    val spark = df.sparkSession
    val parts = adaptiveParts(df)
    val n = values.size
    val vcols = values.zipWithIndex.map { case ((v, _), i) =>
      v.cast("long").as(s"__v$i")
    }
    val ranged = scope.track(
      df.select(df.columns.map(col).toSeq ++ vcols: _*)
        .repartitionByRange(parts, orderCols: _*)
        .withColumn("__part", spark_partition_id()))
    val aggs = (0 until n).map(i => sum(col(s"__v$i")).as(s"__s$i"))
    val sums = ranged.groupBy(col("__part"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        r.getInt(0) -> (0 until n).map(i =>
          if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
      }
      .sortBy(_._1)
    val grand = (0 until n).map(i => sums.map(_._2(i)).sum)
    val offsets = sums.map(_._1).zip(
      sums.map(_._2).scanLeft(Seq.fill(n)(0L)) { (acc, s) =>
        acc.zip(s).map { case (a, b) => a + b }
      })
    val offRows: Seq[org.apache.spark.sql.Row] =
      offsets.toSeq.map { case (p, offs) =>
        org.apache.spark.sql.Row.fromSeq(p +: offs)
      }
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
          (0 until n).map(i => org.apache.spark.sql.types.StructField(
            s"__off$i", org.apache.spark.sql.types.LongType,
            nullable = false))))
    val w = Window.partitionBy(col("__part")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = values.zipWithIndex.foldLeft(
      ranged.join(broadcast(offDf), "__part")) {
      case (d, ((_, name), i)) =>
        d.withColumn(name, sum(col(s"__v$i")).over(w) + col(s"__off$i"))
    }
    val dropCols = "__part" +: (0 until n)
      .flatMap(i => Seq(s"__v$i", s"__off$i"))
    (annotated.drop(dropCols: _*), grand)
  }

  /** PER-KEY running total of `value` in the order of `orderCols`
    * WITHIN each key — the scale-correct
    * `sum(v).over(Window.partitionBy(key).orderBy(...))`. The window
    * form sorts each key's ENTIRE slice in ONE task, so a dominant key
    * (one source being most of a 100 TB corpus) collapses to a single
    * executor; this instead reuses the [[runningTotal]] machinery in
    * grouped form:
    *
    *   1. range-partition by (keyCols ++ orderCols) — each key's rows
    *      are contiguous across partitions, every partition bounded by
    *      data/parts regardless of key skew;
    *   2. per-(partition, key) sums — numPartitions × |keys| longs to
    *      the driver (this operator exists for LOW-cardinality keys:
    *      source/lang/domain dims; thousands of keys are fine, millions
    *      mean you wanted the plain per-key window after all);
    *   3. cumulative per-key offsets broadcast back and added to a
    *      WITHIN-partition per-key running sum (the window below
    *      partitions by (__part, key) — every window group is at most
    *      one range partition, never one key's whole slice).
    *
    * Deterministic wherever the sampled range boundaries land, provided
    * (keyCols ++ orderCols) is a total order. Both contracts are
    * ENFORCED, not just documented: key columns must be non-null (the
    * offsets join back on them by equality, which would silently DROP
    * null-key rows — the window form kept them as their own partition,
    * so a silent drop is a behavior change callers must hear about),
    * and the driver round-trip is capped at `maxOffsetRows`
    * (numPartitions × |distinct keys|) — a high-cardinality key fails
    * fast with a pointer at the plain per-key window instead of
    * flooding the driver. Cache lifecycle as in [[runningTotal]]: the
    * ranged input registers in `scope`, released by the scope's owner
    * after the result is consumed.
    */
  def runningTotalByKey(df: DataFrame, keyCols: Seq[String],
                        orderCols: Seq[Column], value: Column,
                        totalName: String = "running_total",
                        scope: graft.CacheScope = graft.CacheScope.harness,
                        maxOffsetRows: Int = 1 << 20)
      : DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    require(keyCols.nonEmpty, "runningTotalByKey: need at least one key")
    val spark = df.sparkSession
    val parts = adaptiveParts(df)
    // persisted for the same reason as runningTotal: the offsets pass
    // and the final pass must see one physical partitioning
    val ranged = scope.track(df.withColumn("__v", value.cast("long"))
      .repartitionByRange(parts, (keyCols.map(col) ++ orderCols): _*)
      .withColumn("__part", spark_partition_id()))
    val nk = keyCols.size
    // tiny driver-side step: numPartitions × |keys| rows (the action
    // also materializes the cache before the final pass reads it).
    // take(max+1) bounds the driver transfer even when the contract is
    // violated — the executor-side aggregate is distributed either way.
    val sumRows = ranged
      .groupBy(col("__part") +: keyCols.map(col): _*)
      .agg(sum(col("__v")).as("__s"))
      .take(maxOffsetRows + 1)
    require(sumRows.length <= maxOffsetRows,
      s"runningTotalByKey: over $maxOffsetRows (partition, key) offset " +
        "rows — this operator is for LOW-cardinality keys (source/lang/" +
        "domain dims); for high-cardinality keys use the plain per-key " +
        "window (row_number/sum over Window.partitionBy), or raise " +
        "maxOffsetRows if the driver can hold the offsets")
    require(!sumRows.exists(r => (1 to nk).exists(r.isNullAt)),
      s"runningTotalByKey: null values in key column(s) " +
        s"${keyCols.mkString(", ")} — the offsets join back on the keys " +
        "by equality, which would silently drop null-key rows; filter " +
        "them out or coalesce to a sentinel first")
    val offRows: Seq[Row] = sumRows
      .groupBy(r => (1 to nk).map(r.get).toSeq)
      .toSeq
      .flatMap { case (kv, rows) =>
        val sorted = rows.sortBy(_.getInt(0))
        val offs = sorted
          .map(r => if (r.isNullAt(nk + 1)) 0L else r.getLong(nk + 1))
          .scanLeft(0L)(_ + _)
        sorted.zip(offs).map { case (r, off) =>
          Row.fromSeq(r.getInt(0) +: kv :+ off)
        }
      }.toSeq
    val offSchema = StructType(
      StructField("__part", IntegerType, nullable = false) +:
        keyCols.map(k => ranged.schema(k)) :+
        StructField("__off", LongType, nullable = false))
    import scala.jdk.CollectionConverters._
    val offDf = spark.createDataFrame(offRows.asJava, offSchema)
    val w = Window
      .partitionBy((col("__part") +: keyCols.map(col)): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "__part" +: keyCols)
      .withColumn(totalName, sum(col("__v")).over(w) + col("__off"))
      .drop("__part", "__off", "__v")
  }

  /** Dense, gap-free 1-based ids PER KEY in the order of `orderCols`
    * within each key — the scale-correct
    * `row_number().over(Window.partitionBy(key).orderBy(...))` for
    * low-cardinality keys: a running total of 1s through
    * [[runningTotalByKey]], so a dominant key never collapses to one
    * task. Same contracts: (keyCols ++ orderCols) must be a total
    * order, keys non-null, key cardinality modest.
    */
  def denseIdsByKey(df: DataFrame, keyCols: Seq[String],
                    orderCols: Seq[Column], idName: String = "row_id",
                    scope: graft.CacheScope = graft.CacheScope.harness)
      : DataFrame =
    runningTotalByKey(df, keyCols, orderCols, lit(1L), idName, scope)
}
