package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: point rows matched to interval rows with
  * `lo <= p <= hi`, optionally under an equi-key.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin — every
  * point compared to every interval, O(|P|·|I|), a non-starter at scale.
  * `binned` restores an equi-join shape: both sides are bucketed on a
  * fixed bin width, intervals are replicated into each bin they overlap,
  * and the range predicate is applied only within a bin. Each
  * (point, interval) pair meets in exactly one bin (the point's), so no
  * post-join dedup is needed. Cost: one shuffle on the bin id (plus the
  * optional key), with interval replication bounded by
  * ceil(span / binWidth) + 1 — pick binWidth near the typical span so
  * replication stays O(1) per interval.
  *
  * This is the composition-first form of the operator (SURVEY extension
  * preference (a)): plain exprs + one equi-join, fully inside
  * codegen/AQE, no custom physical node needed.
  */
object RangeJoin {

  /** Binned inner range join.
    *
    * @param points    point side; `pointCol` must be numeric (cast dates
    *                  to day numbers first)
    * @param intervals interval side with numeric `loCol`/`hiCol`
    * @param binWidth  bucket width in `pointCol` units (> 0)
    * @param keys      optional extra equi-key column names present on
    *                  both sides
    */
  /** Exact floor(`ref` / w) in LONG arithmetic, as a SQL fragment over an
    * already-projected BIGINT column: `floor(x / w)` on doubles silently
    * loses bits above 2^53, which nanosecond-timestamp domains (~1e18)
    * exceed. `ref - pmod(ref, w)` is an exact multiple of w, so the
    * integral `div` is the true floor for negatives too.
    */
  private def binSql(ref: String, w: Long): String =
    s"(($ref - (($ref % ${w}L + ${w}L) % ${w}L)) div ${w}L)"

  def binned(points: DataFrame, pointCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points
      .withColumn("__pv", col(pointCol).cast("long"))
      .withColumn("__bin", expr(binSql("__pv", binWidth)))
      .drop("__pv")
    // one row per bin the interval overlaps
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__lov", col(loCol).cast("long"))
      .withColumn("__hiv", col(hiCol).cast("long"))
      .withColumn("__bin", explode(sequence(
        expr(binSql("__lov", binWidth)),
        expr(binSql("__hiv", binWidth)))))
      .drop("__lov", "__hiv")
    val cond = (Seq(p("__bin") === i("__bin")) ++
      keys.map(k => p(k) === i(k)) ++
      Seq(p(pointCol) >= i(loCol), p(pointCol) <= i(hiCol)))
      .reduce(_ && _)
    val joined = p.join(i, cond, "inner")
    // drop helper bins and the interval-side duplicates of the key cols
    val dropKeys = keys.map(i(_))
    (dropKeys :+ i("__bin") :+ p("__bin")).foldLeft(joined)(_ drop _)
  }

  /** Binned interval-OVERLAP join: rows of `a` and `b` are paired when
    * their closed integer intervals intersect (`aLo <= bHi && bLo <= aHi`),
    * optionally under an equi-key. The companion of `binned` for the
    * interval×interval case (genomics ranges, session overlap, booking
    * conflicts).
    *
    * Scale shape: both sides are replicated into every bin their interval
    * touches and meet through a bin equi-join, so Spark never plans the
    * nested loop. Unlike the point case, an overlapping pair shares SEVERAL
    * bins; to emit it exactly once without a dedup shuffle, the pair is
    * kept only in the bin of `max(aLo, bLo)` — a bin both intervals
    * provably occupy (overlap means `max(lo) <= min(hi)`, and each side's
    * bin range covers `[binOf(lo), binOf(hi)]`). Replication per row is
    * `ceil(span / binWidth) + 1`, so pick `binWidth` near the typical span.
    *
    * The two inputs must have DISJOINT column names (pre-alias before
    * calling); `keys` are the equi-key columns of side `a` paired
    * positionally with `bKeys` (defaults to the same names).
    */
  def overlapBinned(a: DataFrame, aLo: String, aHi: String,
                    b: DataFrame, bLo: String, bHi: String,
                    binWidth: Long, keys: Seq[String] = Nil,
                    bKeysIn: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bKeys = if (bKeysIn.nonEmpty) bKeysIn else keys
    require(bKeys.length == keys.length, "keys/bKeys arity mismatch")
    def explodeBins(df: DataFrame, lo: String, hi: String,
                    loBin: String): DataFrame =
      df.where(col(lo) <= col(hi))
        .withColumn("__lov", col(lo).cast("long"))
        .withColumn("__hiv", col(hi).cast("long"))
        .withColumn(loBin, expr(binSql("__lov", binWidth)))
        .withColumn("__bin", explode(sequence(
          col(loBin), expr(binSql("__hiv", binWidth)))))
        .drop("__lov", "__hiv")
    val ae = explodeBins(a, aLo, aHi, "__alob")
    val be = explodeBins(b, bLo, bHi, "__blob")
    val cond = (Seq(ae("__bin") === be("__bin")) ++
      keys.zip(bKeys).map { case (k, bk) => ae(k) === be(bk) } ++
      Seq(ae(aLo) <= be(bHi), be(bLo) <= ae(aHi),
        // emit each pair exactly once: only in the bin of max(lo, lo)
        ae("__bin") === greatest(ae("__alob"), be("__blob"))))
      .reduce(_ && _)
    ae.join(be, cond, "inner")
      .drop("__bin", "__alob", "__blob")
  }

  /** Reference form for tests/small data: the same semantics as a plain
    * theta join (Spark executes it as a nested-loop broadcast).
    */
  def naive(points: DataFrame, pointCol: String,
            intervals: DataFrame, loCol: String, hiCol: String,
            keys: Seq[String] = Nil): DataFrame = {
    val cond = (keys.map(k => points(k) === intervals(k)) ++
      Seq(points(pointCol) >= intervals(loCol),
        points(pointCol) <= intervals(hiCol))).reduce(_ && _)
    val joined = points.join(intervals, cond, "inner")
    keys.map(intervals(_)).foldLeft(joined)(_ drop _)
  }
}
