package graft

import org.apache.spark.sql.functions._

import graft.llm.Boilerplate

/** Boilerplate-line removal semantics on hand-built docs (the l03 oracle
  * gate covers the volume path over `documents`).
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val chrome = "subscribe to our newsletter"

  private def docs = Seq(
    (1L, s"$chrome\nunique line one\nshared footer"),
    (2L, s"$chrome\nunique line two\nshared footer"),
    (3L, s"$chrome\nunique line three"),
    (4L, s"$chrome") // all-boilerplate doc
  ).toDF("doc_id", "text")

  test("lines above the doc-fraction threshold vanish, others survive") {
    val out = Boilerplate.removeBoilerplate(docs, minDocFrac = 0.75)
      .orderBy("doc_id").as[(Long, String)].collect.toMap
    // chrome is in 4/4 docs (>= 0.75) — gone; footer in 2/4 — kept
    assert(out(1L) == "unique line one\nshared footer")
    assert(out(2L) == "unique line two\nshared footer")
    assert(out(3L) == "unique line three")
  }

  test("an all-boilerplate doc stays as a row with empty text") {
    val out = Boilerplate.removeBoilerplate(docs, minDocFrac = 0.75)
    assert(out.count() == 4)
    assert(out.filter(col("doc_id") === 4L)
      .select("text").as[String].head == "")
  }

  test("line order inside a doc is preserved after removal") {
    val d = Seq((1L, s"keep a\n$chrome\nkeep b\nkeep c"),
      (2L, chrome), (3L, chrome)).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(d, minDocFrac = 0.5)
      .filter(col("doc_id") === 1L).select("text").as[String].head
    assert(out == "keep a\nkeep b\nkeep c")
  }

  test("minDocs floor protects tiny corpora from over-removal") {
    val two = Seq((1L, "x\ny"), (2L, "x\nz")).toDF("doc_id", "text")
    // "x" is in 100% of docs but minDocs=3 keeps it
    val out = Boilerplate.removeBoilerplate(two, minDocFrac = 0.5,
        minDocs = 3L)
      .orderBy("doc_id").as[(Long, String)].collect.toMap
    assert(out(1L) == "x\ny" && out(2L) == "x\nz")
  }

  test("repetition signals: duplicate trigrams and top bigram fraction") {
    import graft.llm.TextAnalysis
    def sig(s: String): (Double, Double) =
      Seq(s).toDF("t").select(
        TextAnalysis.duplicateNgramFraction(col("t"), 3),
        TextAnalysis.topBigramFraction(col("t")))
        .as[(Double, Double)].head
    // "buy now buy now buy now": trigrams = [buy now buy, now buy now,
    // buy now buy, now buy now] → 2 dup of 4; bigrams: "buy now"×3 of 5
    val (dup, top) = sig("buy now buy now buy now")
    assert(dup == 0.5 && top == 0.6)
    // no repetition at all
    val (d2, t2) = sig("one two three four five")
    assert(d2 == 0.0 && t2 == 0.25)
    // shorter than n → zero, not null/NaN
    val (d3, t3) = sig("hi")
    assert(d3 == 0.0 && t3 == 0.0)
  }
}
