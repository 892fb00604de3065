package graft

import org.apache.spark.sql.functions._

import graft.llm.LogReg

/** Integer logistic regression: convergence direction on planted
  * separable data, determinism under repartitioning, and the
  * intercept/unseen-bucket conventions the oracle relies on.
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // planted separable corpus: positives carry "goodmark", negatives
  // "badmark"; SHARED noise tokens only (features are bucket presence,
  // so a per-doc unique token landing in a mark's bucket would pollute
  // the signal — verified: the marks and noise occupy distinct mod-16
  // md5 buckets)
  private def docs = (0L until 60L).map { i =>
    val pos = i % 2 == 0
    val mark = if (pos) "goodmark" else "badmark"
    (i, pos, s"filler the and $mark tail${i % 7}")
  }.toDF("doc_id", "is_pos", "text")

  test("planted separable data: 10 GD rounds classify the training set, " +
      "and weights move in the signal direction") {
    val feats = LogReg.hashedCounts(docs, "doc_id", "is_pos", "text",
      buckets = 16)
    val w = LogReg.fit(feats, iters = 10, lrDen = 4L)
    val scored = LogReg.margins(feats, w)
      .collect().map(r => (r.getBoolean(1), r.getLong(2)))
    assert(scored.nonEmpty)
    assert(scored.forall { case (y, m) => (m > 0) == y },
      scored.take(6).mkString(", "))
    // the signal buckets moved away from zero
    assert(w.values.exists(_ != 0L))
    spark.catalog.clearCache()
  }

  test("fit is deterministic under repartitioning (exact integer " +
      "arithmetic, no order dependence)") {
    val feats = LogReg.hashedCounts(docs, "doc_id", "is_pos", "text",
      buckets = 16)
    val w1 = LogReg.fit(feats, iters = 3, lrDen = 10L)
    val w2 = LogReg.fit(feats.repartition(13), iters = 3, lrDen = 10L)
    assert(w1 == w2)
    spark.catalog.clearCache()
  }

  test("margins: unseen buckets score 0 (the oracle's left-join " +
      "coalesce convention)") {
    val feats = Seq((1L, true, 99L, 5L), (1L, true, -1L, 1L))
      .toDF("id", "y", "b", "c")
    val m = LogReg.margins(feats, Map(-1L -> 7L))
      .collect().map(r => r.getLong(2)).head
    assert(m == 7L) // bucket 99 unseen -> 0; intercept 1 * 7
  }

  test("persistence: weights survive the parquet round trip losslessly " +
      "and score-after-load ≡ score-after-fit") {
    val feats = LogReg.hashedCounts(docs, "doc_id", "is_pos", "text",
      buckets = 16)
    val w = LogReg.fit(feats, iters = 5, lrDen = 4L)
    val dir = Registry.scratchDir("spec_lr_weights") + "/w"
    LogReg.saveWeights(spark, w, dir)
    val loaded = LogReg.loadWeights(spark, dir)
    assert(loaded == w) // exact BIGINT columns: bit-lossless
    val afterFit = LogReg.margins(feats, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val afterLoad = LogReg.margins(feats, loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(afterLoad == afterFit)
    spark.catalog.clearCache()
  }

  test("label-free apply path: scores(features(docs)) == the labeled " +
      "margins (the streaming scorer's contract)") {
    val feats = LogReg.hashedCounts(docs, "doc_id", "is_pos", "text",
      buckets = 16)
    val w = LogReg.fit(feats, iters = 5, lrDen = 4L)
    val viaMargins = LogReg.margins(feats, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaScores = LogReg.scores(
        LogReg.features(docs, "doc_id", "text", buckets = 16), w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaScores == viaMargins)
    spark.catalog.clearCache()
  }
}
