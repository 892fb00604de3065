package graft

import graft.llm.Dedup

/** CCNet-style segment dedup (Dedup.segmentDedup): first occurrence wins
  * globally, later copies are cut mid-document, order preserved.
  */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def w(n: Int, tag: String) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("duplicated segment survives only at its first (id, seg_idx)") {
    // doc 1: [A][B]; doc 2: [B][C]  (10-word segments)
    val A = w(10, "a"); val B = w(10, "b"); val C = w(10, "c")
    val df = Seq((1L, s"$A $B"), (2L, s"$B $C")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id")
      .orderBy("id").collect()
    assert(out(0).getString(1) == s"$A $B")
    assert(out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == C) // B cut from doc 2
    assert(out(1).getLong(2) == 1L)
  }

  test("intra-document repetition is cut after the first copy") {
    val A = w(10, "x")
    val df = Seq((7L, s"$A $A $A")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id").collect().head
    assert(out.getString(1) == A)
    assert(out.getLong(2) == 1L)
  }

  test("doc reduced to nothing stays present with empty text") {
    val A = w(10, "z")
    val df = Seq((1L, A), (2L, A)).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id")
      .orderBy("id").collect()
    assert(out(0).getString(1) == A && out(0).getLong(2) == 1L)
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 0L)
  }

  test("trailing partial segment is its own unit") {
    val A = w(10, "p"); val tail = "q1 q2 q3"
    val df = Seq((1L, s"$A $tail"), (2L, tail)).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id")
      .orderBy("id").collect()
    assert(out(0).getString(1) == s"$A $tail")
    assert(out(1).getString(1) == "") // the 3-word doc IS the dup segment
  }

  test("partition count does not change the outcome") {
    val docs = (1L to 60L).map { i =>
      val base = w(10, s"t${i % 7}_") // 7 distinct segments, many copies
      (i, s"$base ${w(10, s"u${i}_")}")
    }
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df8 = docs.toDF("doc_id", "text").repartition(8)
    val r1 = Dedup.segmentDedup(df1, "text", "doc_id")
      .orderBy("id").collect().toSeq
    val r8 = Dedup.segmentDedup(df8, "text", "doc_id")
      .orderBy("id").collect().toSeq
    assert(r1 == r8)
  }
}
