package graft

import org.apache.spark.sql.functions._

import graft.etl.Merge

/** MERGE-upsert and SCD2 semantics (the u06/w08 oracle gate covers the
  * volume path; these pin the edge semantics on hand-built rows).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("upsert: update beats base, insert lands, delete removes") {
    val updates = Seq(
      (2L, "b2", 22.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (9L, "new", 90.0, false) // insert
    ).toDF("k", "name", "v", "del")
    val out = Merge.upsert(base, updates, Seq("k"), deleteCol = Some("del"))
      .orderBy("k").as[(Long, String, Double)].collect.toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "new", 90.0)))
  }

  test("upsert: highest version wins among several updates of one key") {
    val updates = Seq(
      (2L, "v1", 21.0, 1L), (2L, "v3", 23.0, 3L), (2L, "v2", 22.0, 2L)
    ).toDF("k", "name", "v", "ver")
    val out = Merge.upsert(base.withColumn("ver", lit(0L)), updates,
        Seq("k"), versionCol = Some("ver"))
      .filter(col("k") === 2L).select("name", "v")
      .as[(String, Double)].collect.toSeq
    assert(out == Seq(("v3", 23.0)))
  }

  test("upsert: extra update columns are dropped, base schema kept") {
    val updates = Seq((1L, "a9", 11.0, "ignored")).toDF("k", "name", "v", "x")
    val out = Merge.upsert(base, updates, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "name", "v"))
    assert(out.filter(col("k") === 1L).select("v").as[Double].head == 11.0)
  }

  test("scd2: half-open intervals chain with exactly one current row") {
    val changes = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-02-01", 12.0),
      (1L, "2024-03-15", 9.0), (2L, "2024-06-01", 50.0)
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = Merge.scd2(changes, Seq("k"), "d")
      .select(col("k"), date_format(col("d"), "yyyy-MM-dd").as("from"),
        coalesce(date_format(col("effective_to"), "yyyy-MM-dd"), lit("∞"))
          .as("to"), col("is_current"))
      .orderBy("k", "from")
      .as[(Long, String, String, Boolean)].collect.toSeq
    assert(out == Seq(
      (1L, "2024-01-01", "2024-02-01", false),
      (1L, "2024-02-01", "2024-03-15", false),
      (1L, "2024-03-15", "∞", true),
      (2L, "2024-06-01", "∞", true)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val curr = Seq((1L, "a", 10.0),  // unchanged
      (2L, "b", 21.0),               // changed
      (9L, "new", 90.0)              // added; 3 removed
    ).toDF("k", "name", "v")
    val out = Merge.snapshotDiff(prev, curr, Seq("k"), Seq("name", "v"))
      .orderBy("k").as[(Long, String)].collect.toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (9L, "added")))
  }

  test("snapshotDiff: NULL and empty string fingerprint differently") {
    val prev = Seq((1L, Option.empty[String]), (2L, Option("")))
      .toDF("k", "name")
    val curr = Seq((1L, Option("")), (2L, Option.empty[String]))
      .toDF("k", "name")
    val out = Merge.snapshotDiff(prev, curr, Seq("k"), Seq("name"))
      .orderBy("k").as[(Long, String)].collect.toSeq
    assert(out == Seq((1L, "changed"), (2L, "changed")))
  }

  test("maintainAgg: deltas fold in, zero-count groups vanish, composes") {
    val prev = Seq(("a", 2L, BigDecimal(30.0)), ("b", 1L, BigDecimal(5.0)))
      .toDF("k", "cnt", "sum_v")
    val changes = Seq(
      ("a", 10.0, false),  // insert
      ("b", 5.0, true),    // delete b's only row -> group vanishes
      ("c", 7.5, false)    // new group
    ).toDF("k", "v", "del")
    val out = Merge.maintainAgg(prev, changes, Seq("k"), Seq("v"), "del")
      .select(col("k"), col("cnt"), col("sum_v").cast("double"))
      .orderBy("k").as[(String, Long, Double)].collect.toSeq
    assert(out == Seq(("a", 3L, 40.0), ("c", 1L, 7.5)), out.toString)
    // composes: feeding its own output as prev works (same shape)
    val again = Merge.maintainAgg(
      Merge.maintainAgg(prev, changes, Seq("k"), Seq("v"), "del"),
      Seq(("c", 2.5, false)).toDF("k", "v", "del"),
      Seq("k"), Seq("v"), "del")
      .select(col("k"), col("cnt"), col("sum_v").cast("double"))
      .orderBy("k").as[(String, Long, Double)].collect.toSeq
    assert(again == Seq(("a", 3L, 40.0), ("c", 2L, 10.0)), again.toString)
  }

  test("snapshotDiff: separator-containing and sentinel-equal values differ") {
    // ("a\u0001","b") vs ("a","\u0001b"): a \u0001-joined fingerprint
    // concatenates both to the same bytes; ("x",NULL) vs ("x","\u0000")
    // likewise collides with a null-sentinel scheme. The JSON-encoded
    // fingerprint must classify both as changed.
    val prev = Seq((1L, "a\u0001", Option("b")), (2L, "x", Option.empty[String]))
      .toDF("k", "c1", "c2")
    val curr = Seq((1L, "a", Option("\u0001b")), (2L, "x", Option("\u0000")))
      .toDF("k", "c1", "c2")
    val out = Merge.snapshotDiff(prev, curr, Seq("k"), Seq("c1", "c2"))
      .orderBy("k").as[(Long, String)].collect.toSeq
    assert(out == Seq((1L, "changed"), (2L, "changed")), out.toString)
  }

  test("snapshotDiff: adjacent-column concat cannot collide") {
    // ("ab","c") vs ("a","bc") — a separator-free fingerprint would
    // classify this as unchanged
    val prev = Seq((1L, "ab", "c")).toDF("k", "c1", "c2")
    val curr = Seq((1L, "a", "bc")).toDF("k", "c1", "c2")
    val out = Merge.snapshotDiff(prev, curr, Seq("k"), Seq("c1", "c2"))
      .as[(Long, String)].collect.toSeq
    assert(out == Seq((1L, "changed")))
  }
}
