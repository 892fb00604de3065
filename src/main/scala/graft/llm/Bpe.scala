package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer — train and encode, Spark-first.
  *
  * Training follows the classic word-frequency formulation (Sennrich et
  * al. 2016): merges are learned from the corpus WORD-FREQUENCY table,
  * not the raw corpus, so the distributed work is one tokenize+groupBy
  * (any corpus size), and the iterative merge loop runs driver-side over
  * a BOUNDED vocabulary (`maxVocabWords` most frequent words — the
  * standard practice; a 100 TB corpus still has a driver-sized frequent-
  * word table). Determinism: vocabulary is capped by (count desc, word
  * asc), each merge picks the (count desc, pair asc) maximum, so the
  * merge list is a pure function of the corpus.
  *
  * Encoding is the greedy lowest-merge-rank loop (the GPT-2 scheme,
  * equivalent to replaying training merges in order) applied per word
  * inside `mapPartitions` — per-row iterative state no Catalyst
  * expression can express (SURVEY §2.10 escape-hatch order) — with a
  * per-partition word→tokens memo so each DISTINCT word is encoded once
  * per partition, which on natural-language skew (Zipf) makes the encode
  * pass ~dictionary-cost, not corpus-cost.
  */
object Bpe {

  /** End-of-word marker, appended as a distinct symbol so merges can
    * learn word-final units ("w</w>" vs mid-word "w").
    */
  val EOW = "</w>"

  /** Whitespace word-split after lowercasing — matches
    * `TextAnalysis.tokens`' notion of a word.
    */
  def words(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Train `numMerges` merges from a word-frequency table. Pure Scala —
    * callers feed it a collected (word, count) list (see `fit`).
    */
  def trainMerges(wordFreq: Seq[(String, Long)],
                  numMerges: Int): Seq[(String, String)] = {
    // each word as its symbol sequence; parallel count array
    val syms = wordFreq.map { case (w, _) =>
      scala.collection.mutable.ArrayBuffer[String](
        (w.map(_.toString) :+ EOW): _*)
    }.toArray
    val counts = wordFreq.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var iter = 0
    while (iter < numMerges) {
      val pairCounts =
        scala.collection.mutable.HashMap[(String, String), Long]()
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + counts(i)
          j += 1
        }
        i += 1
      }
      if (pairCounts.isEmpty) iter = numMerges
      else {
        // deterministic argmax: count desc, then pair lexicographic asc
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        i = 0
        while (i < syms.length) {
          val s = syms(i)
          var j = 0
          while (j < s.length - 1) {
            if (s(j) == best._1 && s(j + 1) == best._2) {
              s(j) = merged
              s.remove(j + 1)
            } else j += 1
          }
          i += 1
        }
        iter += 1
      }
    }
    merges.toSeq
  }

  /** Distributed fit: tokenize+count words (one shuffle), cap the
    * vocabulary deterministically, train merges driver-side.
    */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
          maxVocabWords: Int = 5000): Seq[(String, String)] = {
    val freq = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainMerges(freq, numMerges)
  }

  /** Encode one word with the greedy lowest-rank loop. */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): Seq[String] = {
    var s = (word.map(_.toString) :+ EOW).toVector
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < s.length - 1) {
        val r = ranks.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else s = (s.take(bestAt) :+ (s(bestAt) + s(bestAt + 1))) ++
        s.drop(bestAt + 2)
    }
    s
  }

  /** Distributed encode: adds `tokens ARRAY<STRING>` (BPE units of the
    * lowercased whitespace words, each ending with its EOW-marked unit)
    * and `n_bpe_tokens`. The merge table rides to executors as a
    * closure-captured rank map (KBs); a per-partition memo makes the
    * cost per distinct word, not per occurrence.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_bpe_tokens", IntegerType, nullable = false)))
    val input = docs.select(col(idCol).cast("long"),
      coalesce(col(textCol), lit("")))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val memo = scala.collection.mutable.HashMap[String, Seq[String]]()
      rows.map { r =>
        val toks = words(r.getString(1)).flatMap(w =>
          memo.getOrElseUpdate(w, encodeWord(w, ranks)))
        Row(r.getLong(0), toks, toks.length)
      }
    }(enc)
  }
}
