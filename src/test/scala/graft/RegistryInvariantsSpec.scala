package graft

import org.apache.spark.sql.functions._

/** Invariants for the registry-only analytics entries that the oracle gate
  * checks by value: partition-order independence (the property that makes
  * them safe on a 1000-executor cluster) and deterministic tie-breaks.
  */
class RegistryInvariantsSpec extends SparkSpec {

  test("a26_exact_corr: integer moments make Pearson partition-invariant") {
    val q = SparkEntry.queries("a26_exact_corr")
    val base = q(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(base.nonEmpty && base.values.forall(v => v >= -1.0 && v <= 1.0))
    // Built-in corr() streams FP sums, so its bits shift with partitioning;
    // the integer-moment formulation must not. Re-run under a different
    // shuffle width and require BIT equality, not approx equality.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = q(spark, sf).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(again == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("round-8 float outputs are partition-order invariant (bit equality)") {
    // t14/a41/t16/n09 all emit doubles built from exact integer/decimal
    // aggregates through fixed-order row-wise arithmetic — so their bits
    // must not move when the shuffle width (and thus partial-agg merge
    // order) changes.
    val names = Seq("t14_bm25", "a41_group_ols", "t16_zipf_fit",
      "n09_knn_eval", "a43_percentile_cont", "x33_linear_interpolate",
      // this round's determinism claims: integer graph fixpoints, the
      // native TopK operator's total order, quantized-integer cosine,
      // round-9 bigram logprobs, and the portable LSH pipeline
      "g01_pagerank", "g03_triangles", "g04_label_propagation",
      "w24_native_topk", "n10_centroid_cosine", "t19_bigram_lm",
      "d22_segment_dedup", "d23_decontaminate_portable",
      // round-9 determinism claims: integer BFS distances, the portable
      // SemDeDup twin's quantized cosines, real-decode pooled features
      "g05_bfs_distances", "d24_semantic_dedup_portable",
      "m02_decode_features", "d25_incremental_portable",
      "n12_ann_lsh_portable", "n13_ann_ivf_portable", "d26_dup_spans",
      "d27_contamination_report", "t20_perplexity_buckets",
      "t21_script_mix", "a45_hll_portable", "a46_cm_portable",
      "n14_cosine_neardup_portable")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = names.map(n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      names.foreach { n =>
        val again = SparkEntry.queries(n)(spark, sf).collect().toSeq
        assert(again == base(n), s"$n shifted under repartitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("d14_canonical_docs: one canonical per cluster, none beats it") {
    import graft.llm.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 500)
    val canon = SparkEntry.queries("d14_canonical_docs")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val cc = Dedup.connectedComponents(
        docs.select(col("doc_id").as("id")),
        Dedup.exactNgramNearDups(docs, "text", "doc_id", 3, 0.5))
      .join(docs.select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text")).as("q")), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every rep got exactly one canonical, the canonical is a member of
    // its own cluster, and no member has strictly higher quality
    assert(canon.keySet == cc.map(_._2).toSet)
    cc.groupBy(_._2).foreach { case (rep, members) =>
      val (cId, cQ) = canon(rep)
      assert(members.exists(_._1 == cId), s"canonical $cId not in $rep")
      assert(members.forall(_._3 <= cQ), s"better member than $cId in $rep")
    }
  }

  test("j14_fuzzy_match: every probe resolves once, ties break by name") {
    val rows = SparkEntry.queries("j14_fuzzy_match")(spark, sf).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    val byProbe = rows.map(r =>
      r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    // exact hit wins at distance 0
    assert(byProbe("NATION_3") == (("NATION_3", 0L)))
    // NATION_99 is distance 1 from both NATION_19 (substitution) and
    // NATION_9 (deletion): the tie must break lexicographically.
    assert(byProbe("NATION_99")._1 == "NATION_19")
    assert(byProbe("NATION_99")._2 == 1L)
  }

  test("float-heavy round-5 queries are bit-stable across shuffle widths") {
    // The property the oracle gate implies but never re-checks: the SAME
    // bits under a different partitioning. Any order-dependent double
    // accumulation (a plain sum(double), a fold whose order follows task
    // order) fails this immediately at width 7 vs the session default.
    val names = Seq("w18_ewma", "j17_star_rollup", "a28_chi_square",
      "l09_quality_logit", "w17_rolling_median", "a33_incremental_agg")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = names.map(n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      names.zip(base).foreach { case (n, (_, rows)) =>
        val again = SparkEntry.queries(n)(spark, sf)
          .collect().map(_.toString).toSeq
        assert(again == rows, s"$n drifted under shuffle width 7")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
