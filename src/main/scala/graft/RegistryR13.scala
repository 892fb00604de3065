package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Registry.t

/** Round-13 widening: the Unigram-LM (SentencePiece-style) tokenizer —
  * the second major tokenizer family a pretraining pipeline trains
  * (BPE landed as t12/t23) — plus the Kneser-Ney trigram LM, the
  * maintained window-digest index for incremental ExactSubstr, and the
  * full prep-DAG / fertility-budget compositions.
  */
object RegistryR13 {

  private val ugParams = graft.llm.UnigramLm.Params()

  def entries: Seq[Q] = Seq(

    // ---- T28: Unigram-LM tokenizer FIT (llm/UnigramLm.fit; Kudo 2018
    //      semantics in the hard-EM form) — the fitted vocabulary
    //      itself on the hash path: substring seeding (chars bypass the
    //      cap), two Viterbi-EM rounds over the weighted word table,
    //      prune by last-round count with chars forced in, add-one
    //      final scores in integer micro-nats. The oracle re-derives
    //      the ENTIRE chain independently (word freqs, seed, two
    //      unrolled DP+backtrace passes, prune), so a drift anywhere in
    //      training breaks the gate — the t23 posture applied to the
    //      second tokenizer family. Spark shape: one tokenize+groupBy
    //      shuffle; EM over the bounded frequent-word table driver-side
    //      (the Bpe.fit posture — a 100 TB corpus still has a
    //      driver-sized frequent-word table). --------------------------
    Q("t28_unigram_fit",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        val vocab = graft.llm.UnigramLm.fit(docs, "text", ugParams)
        import s.implicits._
        vocab.toDF("piece", "cnt", "score_micronats").orderBy("piece")
      },
      Some(graft.llm.UnigramLm.vocabOracleSql("documents", "doc_id",
        "text", maxDocId = 500L, ugParams))),

    // ---- T29: Unigram-LM ENCODE, portable — fit + maximum-likelihood
    //      segmentation of every document (per-word Viterbi over the
    //      piece lattice, integer micro-nat scores, smallest-split-
    //      point tie-break), reassembled in word order. The oracle runs
    //      a THIRD independent DP pass against its own re-derived
    //      vocabulary, so the gate proves train AND encode end to end.
    //      Encode ships the score map in mapPartitions with a
    //      per-partition word memo (dictionary-cost on Zipf skew). ----
    Q("t29_unigram_portable",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        val vocab = graft.llm.UnigramLm.fit(docs, "text", ugParams)
        graft.llm.UnigramLm.encode(docs, "doc_id", "text", vocab, ugParams)
          .select(col("id").as("doc_id"), col("n_pieces"),
            concat_ws(" ", col("pieces")).as("pieces_str"))
          .orderBy("doc_id")
      },
      Some(graft.llm.UnigramLm.portableOracleSql("documents", "doc_id",
        "text", maxDocId = 500L, ugParams))),

    // ---- T30: interpolated Kneser-Ney TRIGRAM LM (llm/TextAnalysis
    //      .knTrigramScores) — the published perplexity-filter model
    //      (CCNet thresholds on KN; t19's add-one bigram was the
    //      proxy): trained on doc_id < 400, scored on the HELD-OUT
    //      slice so discount/backoff/OOV-floor paths all genuinely
    //      execute. Every continuation/type count integer-exact from
    //      ONE trigram-type table; each probability one fixed-shape
    //      IEEE expression; ln to 9 dp; DECIMAL per-doc fold. Short
    //      docs (<3 tokens) surface with n_trigrams = 0, NULL score. --
    Q("t30_kn_trigram_lm",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.llm.TextAnalysis.knTrigramScores(
            docs.filter(col("doc_id") < 400),
            docs.filter(col("doc_id") >= 400), "doc_id", "text")
          .withColumnRenamed("id", "doc_id").orderBy("doc_id")
      },
      Some {
        val ctes = graft.llm.TextAnalysis.knOracleCtes("documents",
          "doc_id", "text", "doc_id < 400", "doc_id >= 400")
        s"""WITH ${ctes.mkString(",\n")}
           |SELECT id AS doc_id, n_trigrams, avg_logp
           |FROM kn_out ORDER BY 1""".stripMargin
      }),

    // ---- T31: perplexity buckets RECOMPOSED on the KN trigram model —
    //      t20's per-source tercile recipe (deterministic top-100-by-id
    //      sample, rank thresholds, head/middle/tail verdicts) driven
    //      by published-fidelity scores instead of the add-one-bigram
    //      proxy: train on doc_id < 400, score the WHOLE corpus (so
    //      held-out docs ride backoff), bucket per source. ------------
    Q("t31_kn_perplexity_buckets",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val scored = graft.llm.TextAnalysis.knTrigramScores(
            docs.filter(col("doc_id") < 400), docs, "doc_id", "text")
          .join(docs.select(col("doc_id").as("id"), col("source")), "id")
        val sample = graft.plans.TopKPerKey(
            scored.filter(col("n_trigrams") > 0)
              .select(col("source"), col("id"), col("avg_logp")),
            keys = Seq(col("source")), order = Seq(col("id").asc), k = 100)
        val ranked = sample
          .withColumn("r", row_number().over(Window.partitionBy("source")
            .orderBy(col("avg_logp").desc, col("id"))))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("source")))
        val th = ranked.filter(col("r") === expr("(n + 2) div 3"))
          .select(col("source"), col("avg_logp").as("t1"))
          .join(ranked.filter(col("r") === expr("(2 * n + 2) div 3"))
            .select(col("source"), col("avg_logp").as("t2")), "source")
        scored.join(broadcast(th), Seq("source"), "left")
          .select(col("id").as("doc_id"), col("source"),
            when(col("avg_logp").isNull, "unscored")
              .when(col("avg_logp") >= col("t1"), "head")
              .when(col("avg_logp") >= col("t2"), "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some {
        val ctes = graft.llm.TextAnalysis.knOracleCtes("documents",
          "doc_id", "text", "doc_id < 400", "doc_id >= 0")
        s"""WITH ${ctes.mkString(",\n")},
           |kb_scored AS (
           |  SELECT o.id, d.source, o.n_trigrams, o.avg_logp
           |  FROM kn_out o JOIN documents d ON d.doc_id = o.id),
           |kb_smp AS (
           |  SELECT source, id, avg_logp FROM (
           |    SELECT source, id, avg_logp,
           |      row_number() OVER (PARTITION BY source ORDER BY id)
           |        AS sr
           |    FROM kb_scored WHERE n_trigrams > 0)
           |  WHERE sr <= 100),
           |kb_rk AS (
           |  SELECT source, id, avg_logp,
           |    row_number() OVER (PARTITION BY source
           |                       ORDER BY avg_logp DESC, id) AS r,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM kb_smp),
           |kb_th AS (
           |  SELECT a.source, a.avg_logp AS t1, b.avg_logp AS t2
           |  FROM (SELECT source, avg_logp FROM kb_rk
           |        WHERE r = (n + 2) // 3) a
           |  JOIN (SELECT source, avg_logp FROM kb_rk
           |        WHERE r = (2 * n + 2) // 3) b
           |    ON b.source = a.source)
           |SELECT s.id AS doc_id, s.source,
           |  CASE WHEN s.avg_logp IS NULL THEN 'unscored'
           |    WHEN s.avg_logp >= t.t1 THEN 'head'
           |    WHEN s.avg_logp >= t.t2 THEN 'middle'
           |    ELSE 'tail' END AS bucket
           |FROM kb_scored s LEFT JOIN kb_th t ON t.source = s.source
           |ORDER BY doc_id""".stripMargin
      })
  )
}
