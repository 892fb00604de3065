package graft

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
        "text", maxDocId = 500L, ugParams)))
  )
}
