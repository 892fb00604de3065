package graft

import org.apache.spark.sql.functions._

import graft.etl.{RangeJoin, SkewJoin}

/** Binned range join and salted skew join: exact parity with their naive
  * counterparts, plus the structural properties that make them the
  * scale-safe forms (bounded replication, no nested-loop plan).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("binned == naive on randomized points and intervals") {
    // negative coordinates included: floor(p/width) must bin -1 and +1
    // into DIFFERENT buckets (integer division would collapse them)
    val points = (1 to 400)
      .map(i => (i.toLong, (rnd.nextInt(2000) - 1000).toLong))
      .toDF("p_id", "p")
    // spans from 0 (degenerate) to 120 (many bins wide at width 32)
    val intervals = (1 to 60).map { i =>
      val lo = (rnd.nextInt(2000) - 1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(121))
    }.toDF("i_id", "lo", "hi")

    for (width <- Seq(1L, 32L, 2048L)) {
      val got = RangeJoin.binned(points, "p", intervals, "lo", "hi", width)
        .select("p_id", "i_id").as[(Long, Long)].collect().sorted
      val want = RangeJoin.naive(points, "p", intervals, "lo", "hi")
        .select("p_id", "i_id").as[(Long, Long)].collect().sorted
      assert(got.sameElements(want), s"parity failed at binWidth=$width")
      assert(got.length == got.distinct.length, "pair emitted twice")
    }
  }

  test("binning stays exact above 2^53 (nanosecond-timestamp domain)") {
    // double-based floor(x/w) cannot distinguish 2^53+1 from 2^53+2;
    // integer binning must. Interval [base+1, base+2] at width 4 matches
    // the in-range point and excludes base+3's neighbor bin edge cases.
    val base = 1L << 53
    val points = Seq((1L, base + 1), (2L, base + 2), (3L, base + 7))
      .toDF("p_id", "p")
    val intervals = Seq((9L, base + 1, base + 2)).toDF("i_id", "lo", "hi")
    val got = RangeJoin.binned(points, "p", intervals, "lo", "hi", 4L)
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted
    val want = RangeJoin.naive(points, "p", intervals, "lo", "hi")
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted
    assert(got.sameElements(want) && got.length == 2, got.toSeq)
  }

  test("binned respects an extra equi-key") {
    val points = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("p_id", "k", "p")
    val intervals = Seq((7L, "a", 0L, 20L)).toDF("i_id", "k", "lo", "hi")
    val got = RangeJoin.binned(points, "p", intervals, "lo", "hi", 8L,
      keys = Seq("k")).select("p_id", "i_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 7L))) // key "b" must not match
  }

  test("binned plans an equi-join, not a nested loop") {
    val points = Seq((1L, 5L)).toDF("p_id", "p")
    val intervals = Seq((1L, 0L, 10L)).toDF("i_id", "lo", "hi")
    val plan = RangeJoin.binned(points, "p", intervals, "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in:\n$plan")
  }

  test("interval replication is ceil(span/width)+1 bounded") {
    // span 100 at width 10 → at most 11 bins; count the exploded rows
    val intervals = Seq((1L, 0L, 100L)).toDF("i_id", "lo", "hi")
    val exploded = intervals.withColumn("bin", explode(sequence(
      floor(col("lo") / 10).cast("long"),
      floor(col("hi") / 10).cast("long"))))
    assert(exploded.count() == 11)
  }

  test("overlapBinned == naive overlap join on randomized intervals") {
    // two interval sets with spans 0..60, coordinates spanning negatives;
    // the naive theta join is the semantics oracle
    def mk(n: Int, pfx: String) = (1 to n).map { i =>
      val lo = (rnd.nextInt(1000) - 500).toLong
      (i.toLong, lo, lo + rnd.nextInt(61))
    }.toDF(s"${pfx}_id", s"${pfx}_lo", s"${pfx}_hi")
    val a = mk(120, "a")
    val b = mk(90, "b")
    val want = a.join(b,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    for (width <- Seq(1L, 16L, 4096L)) {
      val got = RangeJoin.overlapBinned(a, "a_lo", "a_hi",
          b, "b_lo", "b_hi", width)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted
      assert(got.sameElements(want), s"overlap parity failed at w=$width")
      assert(got.length == got.distinct.length,
        s"pair emitted twice at w=$width")
    }
  }

  test("overlapBinned respects equi-keys and plans no nested loop") {
    val a = Seq((1L, "x", 0L, 10L), (2L, "y", 0L, 10L))
      .toDF("a_id", "ka", "a_lo", "a_hi")
    val b = Seq((7L, "x", 5L, 15L)).toDF("b_id", "kb", "b_lo", "b_hi")
    val j = RangeJoin.overlapBinned(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
      8L, keys = Seq("ka"), bKeysIn = Seq("kb"))
    assert(j.select("a_id", "b_id").as[(Long, Long)].collect()
      .toSeq == Seq((1L, 7L))) // key "y" must not match
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in:\n$plan")
  }

  test("salted skew join == plain join under a hot key") {
    // 90% of fact rows share one key — the skew case salting exists for
    val fact = (1 to 500).map { i =>
      (i.toLong, if (i <= 450) 1L else (i % 20).toLong, i * 1.5)
    }.toDF("row_id", "k", "v")
    val dim = (0 to 19).map(k => (k.toLong, s"name_$k")).toDF("k", "name")

    val got = SkewJoin.salted(fact, dim, "k", "row_id", salts = 7)
      .select("row_id", "k", "name").as[(Long, Long, String)]
      .collect().sorted
    val want = fact.join(dim, Seq("k"), "inner")
      .select("row_id", "k", "name").as[(Long, Long, String)]
      .collect().sorted
    assert(got.sameElements(want))
  }

  test("salting spreads a hot key over multiple salt buckets") {
    val fact = (1 to 300).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(col("row_id")), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key spread over ~8 salts, got $salts")
  }
}
