package graft

import org.apache.spark.sql.functions._

import graft.llm.UnigramLm
import graft.llm.UnigramLm.Params

/** Unigram-LM tokenizer: Viterbi optimality + tie-break, UNK totality,
  * lossless round-trip, fit determinism, encode on the real corpus.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the maximum-likelihood segmentation") {
    // 'ab' as one piece beats 'a'+'b' when its score exceeds the sum
    val s1 = Map("a" -> -100L, "b" -> -100L, "ab" -> -150L)
    assert(UnigramLm.viterbi("ab", s1, 5) == Seq("ab"))
    // ... and loses when it doesn't
    val s2 = Map("a" -> -100L, "b" -> -100L, "ab" -> -250L)
    assert(UnigramLm.viterbi("ab", s2, 5) == Seq("a", "b"))
  }

  test("viterbi tie-break keeps the smallest split point") {
    // 'abc' via 'a'+'bc' (split at 1) vs 'ab'+'c' (split at 2), equal
    // totals: position-3 candidates are bp=1 (piece 'bc') and bp=2
    // (piece 'c') — smallest j wins, so the LAST piece is the longer one
    val s = Map("a" -> -100L, "bc" -> -100L, "ab" -> -100L, "c" -> -100L)
    assert(UnigramLm.viterbi("abc", s, 5) == Seq("a", "bc"))
  }

  test("viterbi is total: unseen chars ride the UNK floor") {
    val s = Map("a" -> -100L)
    assert(UnigramLm.viterbi("axa", s, 5) == Seq("a", "x", "a"))
    assert(UnigramLm.viterbi("", s, 5) == Nil)
    // maxPieceLen bounds lookback: a 3-char piece is invisible at L=2
    val s3 = Map("abc" -> -1L, "a" -> -100L, "b" -> -100L, "c" -> -100L)
    assert(UnigramLm.viterbi("abc", s3, 2) == Seq("a", "b", "c"))
  }

  test("fit is deterministic and chars always survive pruning") {
    val freq = Seq(("banana", 10L), ("bandana", 5L), ("nab", 3L))
    val v1 = UnigramLm.fitFromWordFreq(freq, Params(vocabSize = 4))
    val v2 = UnigramLm.fitFromWordFreq(freq, Params(vocabSize = 4))
    assert(v1 == v2)
    val pieces = v1.map(_._1).toSet
    // every char of the corpus is kept even at a tiny vocab cap
    assert(Set("a", "b", "d", "n").subsetOf(pieces), pieces.toString)
    // output is (piece asc)-sorted with scores strictly negative
    assert(v1.map(_._1) == v1.map(_._1).sorted)
    assert(v1.forall(_._3 < 0L))
  }

  test("encode round-trips: concatenated pieces rebuild each word") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 200)
    val vocab = UnigramLm.fit(docs, "text", Params())
    val enc = UnigramLm.encode(docs, "doc_id", "text", vocab, Params())
      .select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    val texts = docs.select(col("doc_id"), lower(col("text")))
      .as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val expect = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .mkString("")
      assert(enc(id).mkString("") == expect, s"doc $id")
    }
    // pieces are vocabulary members (UNK never fires on its own corpus)
    val pieceSet = vocab.map(_._1).toSet
    assert(enc.values.flatten.forall(pieceSet.contains))
  }

  test("persisted vocabulary: encode after load == encode after fit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100)
    val vocab = UnigramLm.fit(docs, "text", Params())
    val dir = Registry.scratchDir("spec_ugvocab") + "/v"
    UnigramLm.saveVocab(spark, vocab, dir)
    val loaded = UnigramLm.loadVocab(spark, dir)
    assert(loaded == vocab)
    val a = UnigramLm.encode(docs, "doc_id", "text", vocab, Params())
      .select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    val b = UnigramLm.encode(docs, "doc_id", "text", loaded, Params())
      .select("id", "pieces").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("em reassigns mass: final counts cover the weighted corpus") {
    val freq = Seq(("aaab", 8L), ("aab", 4L))
    val p = Params(vocabSize = 6, maxPieceLen = 3)
    val vocab = UnigramLm.fitFromWordFreq(freq, p)
    val counts = vocab.map(v => v._1 -> v._2).toMap
    // every word segments into kept pieces whose counts sum to the
    // total piece usage of the final E-step (mass conservation)
    val scores = vocab.map(v => v._1 -> v._3).toMap
    val used = freq.flatMap { case (w, c) =>
      UnigramLm.viterbi(w, scores, p.maxPieceLen).map(_ -> c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // kept-piece counts came from the PRE-prune segmentation; both
    // segmentations agree here because the vocab cap keeps all pieces
    used.keys.foreach(k => assert(counts.contains(k), k))
  }

  test("parts == whole: vocabulary refit from folded word-freq stats " +
    "equals the whole-corpus fit, incl. through a parquet round-trip") {
    import spark.implicits._
    import graft.llm.WordFreq
    val a = Seq((1L, "abab abba baba ab"), (2L, "ba ab abab"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "abba abab bb aa"), (4L, "baba ba ab"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("wf-ug").toString
    WordFreq.save(WordFreq.stats(a, "text"), tmp)
    val folded = WordFreq.merge(WordFreq.load(spark, tmp),
      WordFreq.stats(b, "text"))
    val p = UnigramLm.Params()
    assert(UnigramLm.fitFromStats(folded, p) ==
      UnigramLm.fit(a.unionByName(b), "text", p))
  }

  test("driver-side tie-breaks use UTF-8 byte order (engine binary " +
    "collation), not Java UTF-16 code-unit order") {
    val pua = "" // U+E000: UTF-8 EE 80 80, UTF-16 unit E000
    val emoji = new String(Character.toChars(0x1F34B)) // UTF-8 F0 9F 8D 8B
    // code-point/UTF-8 order: U+E000 < U+1F34B; UTF-16 disagrees
    // (surrogate D83C < E000)
    assert(UnigramLm.utf8Order.compare(pua, emoji) < 0)
    assert(Ordering.String.compare(pua, emoji) > 0)
    // sorting a piece list with utf8Order matches the engines' binary
    // collation: supplementary char AFTER the private-use char
    assert(Seq(emoji, pua, "a").sorted(UnigramLm.utf8Order) ==
      Seq("a", pua, emoji))
    // agreement with plain String order on ASCII (the common case)
    val ascii = Seq("zebra", "apple", "Mango", "a", "ab")
    assert(ascii.sorted(UnigramLm.utf8Order) == ascii.sorted)
  }
}
