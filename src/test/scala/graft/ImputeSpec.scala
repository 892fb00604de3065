package graft

import org.apache.spark.sql.functions._

import graft.etl.Impute

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("forwardFill carries the last non-null within each key in order") {
    val df = Seq(
      (1L, 1L, Some(10.0)),
      (1L, 2L, None),        // ← 10.0
      (1L, 3L, None),        // ← 10.0 (carried through a run)
      (1L, 4L, Some(40.0)),
      (1L, 5L, None),        // ← 40.0 (newer observation wins)
      (2L, 1L, None),        // leading null: nothing to carry → stays null
      (2L, 2L, Some(7.0)),
      (2L, 3L, None)         // ← 7.0 (keys isolated from each other)
    ).toDF("k", "seq", "v")
    val out = Impute.forwardFill(df, Seq("k"), Seq(col("seq")), Seq("v"))
      .orderBy("k", "seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      (1L, 1L, Some(10.0)), (1L, 2L, Some(10.0)), (1L, 3L, Some(10.0)),
      (1L, 4L, Some(40.0)), (1L, 5L, Some(40.0)),
      (2L, 1L, None), (2L, 2L, Some(7.0)), (2L, 3L, Some(7.0))))
  }

  test("forwardFill fills several value columns in one pass") {
    val df = Seq(
      (1L, 1L, Some(1.0), Some("a")),
      (1L, 2L, None, None),
      (1L, 3L, Some(3.0), None)
    ).toDF("k", "seq", "v", "s")
    val r = Impute.forwardFill(df, Seq("k"), Seq(col("seq")), Seq("v", "s"))
      .orderBy("seq").collect()
    assert(r.map(x => x.getAs[Any]("v")).toSeq == Seq(1.0, 1.0, 3.0))
    assert(r.map(x => x.getAs[Any]("s")).toSeq == Seq("a", "a", "a"))
  }
}
