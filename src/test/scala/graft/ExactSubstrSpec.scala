package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** ExactSubstr-FULL maximal duplicate-span removal
  * (llm/Dedup.exactSubstrDedup): the Lee-et-al-2021 semantics the d31
  * registry oracle replays, pinned on constructed corpora — misaligned
  * long passage removed in one piece, partial-overlap merge,
  * first-occurrence survival, partition invariance.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, p: String) = (1 to n).map(i => s"$p$i")

  test("misaligned long passage is removed from the copy IN ONE PIECE") {
    // the 20-token passage sits at offset 5 in doc 0 and offset 11 in
    // doc 1 — no alignment congruence, every stride-1 window still hits
    val passage = words(20, "dup")
    val doc0 = (words(5, "a") ++ passage ++ words(5, "b")).mkString(" ")
    val doc1 = (words(11, "c") ++ passage ++ words(4, "d")).mkString(" ")
    val out = Dedup.exactSubstrDedup(
      Seq((0L, doc0), (1L, doc1)).toDF("doc_id", "text"),
      "text", "doc_id", w = 8).orderBy("id").collect()
    // first occurrence (doc 0) survives byte-identical
    assert(out(0).getString(1) == doc0)
    assert(out(0).getLong(2) == 0L)
    // the copy loses the WHOLE passage as one maximal span
    assert(out(1).getString(1) ==
      (words(11, "c") ++ words(4, "d")).mkString(" "))
    assert(out(1).getLong(2) == 1L)       // one merged span, not 13
    assert(out(1).getLong(3) == 20L)      // all 20 passage tokens cut
  }

  test("partially-overlapping duplicated regions merge into one span") {
    // doc 2 duplicates doc 0's tokens 0..11 AND doc 1's tokens 4..15 of
    // a 16-token run — the loser windows overlap mid-run and must union
    val run = words(16, "z")
    val doc0 = run.take(12).mkString(" ")          // source of windows 0..4
    val doc1 = run.drop(4).mkString(" ")           // source of windows 4..8
    val doc2 = run.mkString(" ")                   // contains BOTH, overlapping
    val out = Dedup.exactSubstrDedup(
      Seq((0L, doc0), (1L, doc1), (2L, doc2)).toDF("doc_id", "text"),
      "text", "doc_id", w = 8).orderBy("id").collect()
    val d2 = out(2)
    assert(d2.getLong(2) == 1L, "overlapping spans must merge")
    assert(d2.getLong(3) == 16L)
    assert(d2.getString(1) == "")
  }

  test("within-doc repeat: first occurrence survives, later copy cut") {
    val passage = words(10, "r")
    val doc = (passage ++ words(6, "mid") ++ passage).mkString(" ")
    val out = Dedup.exactSubstrDedup(
      Seq((7L, doc)).toDF("doc_id", "text"),
      "text", "doc_id", w = 8).collect()(0)
    assert(out.getString(1) ==
      (passage ++ words(6, "mid")).mkString(" "))
    assert(out.getLong(2) == 1L && out.getLong(3) == 10L)
  }

  test("docs shorter than w and unique docs pass through untouched") {
    val out = Dedup.exactSubstrDedup(
      Seq((0L, "tiny doc"), (1L, words(12, "u").mkString(" ")))
        .toDF("doc_id", "text"),
      "text", "doc_id", w = 8).orderBy("id").collect()
    assert(out(0).getString(1) == "tiny doc")
    assert(out(1).getString(1) == words(12, "u").mkString(" "))
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("incremental: batch copy of a prior passage is cut; prior untouched") {
    val passage = words(20, "shared")
    val prior = Seq(
      (0L, (words(4, "p0") ++ passage ++ words(4, "p1")).mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, (words(7, "b0") ++ passage ++ words(3, "b1")).mkString(" ")),
      (11L, words(15, "only").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstrIncremental(batch, prior,
      "text", "doc_id", w = 8).orderBy("id").collect()
    assert(out(0).getString(1) ==
      (words(7, "b0") ++ words(3, "b1")).mkString(" "))
    assert(out(0).getLong(2) == 1L && out(0).getLong(3) == 20L)
    assert(out(1).getString(1) == words(15, "only").mkString(" "))
    // only batch rows come back — the prior corpus is never rewritten
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L))
  }

  test("incremental: batch-only duplicates get the first-occurrence " +
      "election; equals full-corpus d31 restricted to the batch") {
    val passage = words(18, "dup")
    val prior = (0L to 4L).map(i =>
      (i, words(25, s"pr$i").mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, (words(5, "a") ++ passage).mkString(" ")),
      (11L, (passage ++ words(5, "c")).mkString(" ")),
      (12L, words(12, "z").mkString(" ")))
      .toDF("doc_id", "text")
    val incr = Dedup.exactSubstrIncremental(batch, prior,
        "text", "doc_id", w = 8)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // doc 10 (first occurrence in batch order) keeps the passage
    assert(incr(0)._2 == (words(5, "a") ++ passage).mkString(" "))
    assert(incr(1)._2 == words(5, "c").mkString(" "))
    assert(incr(1)._4 == 18L)
    // equivalence: full-corpus rewrite over prior+batch, restricted to
    // the batch ids (prior ids all precede batch ids)
    val full = Dedup.exactSubstrDedup(prior.unionAll(batch),
        "text", "doc_id", w = 8)
      .filter(col("id") >= 10L).orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(incr == full)
  }

  test("partition invariance: result identical under any partitioning") {
    val passage = words(25, "p")
    val docs = (0L to 19L).map { i =>
      val filler = words(5, s"f$i")
      (i, (filler ++ (if (i % 3 == 0) passage else words(25, s"q$i")) ++
        filler).mkString(" "))
    }.toDF("doc_id", "text")
    val a = Dedup.exactSubstrDedup(docs, "text", "doc_id", w = 8)
      .orderBy("id").collect().toSeq
    val b = Dedup.exactSubstrDedup(docs.repartition(13), "text", "doc_id",
      w = 8).orderBy("id").collect().toSeq
    assert(a == b)
    // the id-0 copy of the shared passage survives; later ones are cut
    val byId = a.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(0L) == 0L)
    assert((3L to 19L by 3L).forall(byId(_) == 25L))
  }

  test("maintained index: two chained batches equal from-scratch d31 " +
      "restricted to the batches; prior text never rescans") {
    val passage = words(20, "sh")
    val prior = Seq(
      (0L, (words(4, "p0") ++ passage ++ words(4, "p1")).mkString(" ")),
      (1L, words(30, "pp").mkString(" "))).toDF("doc_id", "text")
    val b1 = Seq(
      (10L, (words(3, "b0") ++ passage).mkString(" ")),       // vs prior
      (11L, words(16, "b1").mkString(" "))).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, (words(16, "b1") ++ words(2, "t")).mkString(" ")), // vs b1!
      (21L, (passage ++ words(2, "u")).mkString(" ")),         // vs prior
      (22L, words(9, "fresh").mkString(" "))).toDF("doc_id", "text")
    val dir = Registry.scratchDir("spec_d33") + "/idx"
    Dedup.buildDigestIndex(prior, "text", "doc_id", 8, dir, 10000L)
    val r1 = Dedup.exactSubstrWithIndex(b1,
        Dedup.readDigestIndex(spark, dir), "text", "doc_id", 8)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    Dedup.appendDigests(spark, b1, "text", "doc_id", 8, dir, 10000L)
    val idx2 = Dedup.readDigestIndex(spark, dir)
    val r2df = Dedup.exactSubstrWithIndex(b2, idx2, "text", "doc_id", 8)
    val r2 = r2df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // chained == from-scratch over prior ∪ b1 ∪ b2, restricted
    val full = Dedup.exactSubstrDedup(prior.unionAll(b1).unionAll(b2),
        "text", "doc_id", w = 8)
      .filter(col("id") >= 10L).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert((r1 ++ r2).sortBy(_._1).toSeq == full.sortBy(_._1).toSeq)
    // b2's cross-batch duplicate (doc 20 repeats b1's doc 11) was cut
    // by the FOLDED index alone — prior text appears nowhere in the
    // probe plan (the only scans are the batch rows and the digest
    // parquet; batch text rides an in-memory LocalRelation here, so a
    // file scan of prior text would be visible)
    assert(r2.find(_._1 == 20L).get._4 == 16L)
    val scans = r2df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
        if l.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
    }
    assert(scans.nonEmpty)
    scans.foreach(f => assert(
      f.location.rootPaths.forall(_.toString.contains(dir)),
      f.location.rootPaths.mkString(",")))
    // the fold was INCREMENTAL: the index dir gained files, it was not
    // rewritten (the build's files survive untouched)
    assert(idx2.count() >
      Dedup.windowDigests(prior, "text", "doc_id", 8).count())
  }

  test("minSpanChars keeps short-char collisions the published " +
      "threshold would keep, still cuts long spans") {
    // an 8-token collision of 1-char words: span chars = 8 + 7 = 15
    val shortRun = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    // an 8-token collision of 9-char words: span chars = 72 + 7 = 79
    val longRun = words(8, "longword")
    val docs = Seq(
      (0L, (shortRun ++ words(4, "x")).mkString(" ")),
      (1L, (words(4, "y") ++ shortRun).mkString(" ")),
      (2L, (longRun ++ words(4, "z")).mkString(" ")),
      (3L, (words(4, "w") ++ longRun).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, "text", "doc_id", w = 8,
        minSpanChars = 50L)
      .orderBy("id").collect()
    // the 15-char collision survives in BOTH copies (below threshold)
    assert(out(1).getString(1) == (words(4, "y") ++ shortRun)
      .mkString(" "))
    assert(out(1).getLong(2) == 0L)
    // the 79-char span still cuts from the later copy only
    assert(out(3).getString(1) == words(4, "w").mkString(" "))
    assert(out(3).getLong(3) == 8L)
    assert(out(2).getLong(2) == 0L)
    // threshold 0 (default) cuts both — the knob alone changed it
    val strict = Dedup.exactSubstrDedup(docs, "text", "doc_id", w = 8)
      .orderBy("id").collect()
    assert(strict(1).getLong(3) == 8L)
  }
}
