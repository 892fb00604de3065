package graft

import org.apache.spark.sql.functions._

import graft.plans.{AhoCorasick, JaroWinklerSim, MultiMatch, NfcNormalize, StringKernels}

/** Native Jaro-Winkler kernel (plans/StringKernels.scala): golden values
  * captured from DuckDB's `jaro_winkler_similarity` (the registry oracle
  * engine for j36), the floored-transposition divergence from the
  * textbook formula, null/empty semantics, and SQL registration.
  */
class StringKernelsSpec extends SparkSpec {
  import spark.implicits._

  // Captured verbatim from DuckDB 1.x `jaro_winkler_similarity` during
  // development (plus a 5000-pair randomized cross-check, worst diff 0.0
  // — bit-identical). Any drift here breaks j36's oracle.
  private val golden = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abcdef", "abczzz", 0.6666666666666666), // jaro<=0.7: no boost
    ("ab", "ba", 0.0),                        // window 0: no matches
    ("a", "", 0.0),
    ("", "", 0.0),                            // DuckDB: empty-empty is 0
    ("a", "a", 1.0),
    ("prefix_common_zzzzzz", "prefix_common_yyyyy", 0.8873684210526316),
    ("aaaaaaaaaa", "bbbbbbbbbb", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("hello world", "world hello", 0.503030303030303),
    ("ABCVWXYZ", "CABVWXYZ", 0.9583333333333334))

  test("jaroWinkler matches the DuckDB golden values bit-for-bit") {
    for ((a, b, want) <- golden) {
      val got = StringKernels.jaroWinkler(a, b)
      assert(got == want, s"jw('$a','$b') = $got, want $want")
    }
  }

  test("floored transpositions diverge from the textbook half-count") {
    // 'aebcc   ce' vs 'eba': 3 matches, ALL 3 positions mismatched.
    // Textbook t=1.5 gives 0.6; DuckDB floors to t=1 giving 0.6556 —
    // the divergence the kernel must reproduce for oracle parity.
    val got = StringKernels.jaro("aebcc   ce", "eba")
    assert(math.abs(got - 0.6555555555555556) < 1e-15)
  }

  test("symmetry on the golden pairs") {
    for ((a, b, want) <- golden)
      assert(StringKernels.jaroWinkler(b, a) == want, s"jw('$b','$a')")
  }

  test("expression: null in, null out; non-string input rejected") {
    val df = Seq((Option("abc"), Option("abd")), (None, Option("x")),
      (Option("y"), None)).toDF("a", "b")
    val out = df.select(JaroWinklerSim(col("a"), col("b")).as("s"))
      .collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(JaroWinklerSim(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("jaro"))
  }

  test("SQL registration via GraftExtensions") {
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").collect()(0)
    assert(r.getDouble(0) == 0.9611111111111111)
  }

  test("AhoCorasick: classic he/she/his/hers overlap shapes") {
    val dict = Seq("he", "she", "his", "hers")
    val root = AhoCorasick.build(dict)
    def hits(t: String): Seq[String] = {
      val bits = AhoCorasick.matchedIndices(root, t)
      dict.indices.filter(bits.get).map(dict)
    }
    assert(hits("ushers") == Seq("he", "she", "hers"))
    assert(hits("this") == Seq("his"))
    assert(hits("ahishers") == Seq("he", "she", "his", "hers"))
    assert(hits("xyz").isEmpty)
    assert(hits("") == Seq())
  }

  test("AhoCorasick: equivalence with naive contains on random text") {
    val dict = Seq("ab", "abc", "bca", "c", "aab", "cab", "bb")
    val root = AhoCorasick.build(dict)
    val r = new scala.util.Random(23)
    for (_ <- 0 until 2000) {
      val t = (0 until r.nextInt(20)).map(_ => "abc" (r.nextInt(3))).mkString
      val got = dict.indices
        .filter(AhoCorasick.matchedIndices(root, t).get).map(dict)
      val want = dict.filter(t.contains)
      assert(got == want, s"text '$t': got $got want $want")
    }
  }

  test("NfcNormalize: decomposed composes, composed is a no-op, null-safe") {
    val composed = "café"          // é as one code point
    val decomposed = "café"       // e + combining acute
    assert(composed != decomposed)      // different byte strings...
    val df = Seq(Option(decomposed), Option(composed), None).toDF("t")
    val out = df.select(NfcNormalize(col("t")).as("n")).collect()
    assert(out(0).getString(0) == composed)  // ...same normal form
    assert(out(1).getString(0) == composed)
    assert(out(2).isNullAt(0))
    val sql = spark.sql("SELECT nfc_normalize('café') AS n")
      .collect()(0).getString(0)
    assert(sql == composed)
  }

  test("MultiMatch expression: dict-order array, null-safe, one pass") {
    val df = Seq(Option("the quick brown fox"), Option("no matches here?"),
      None).toDF("t")
    val out = df.select(
      MultiMatch(col("t"), Seq("quick", "fox", "lazy", "he")).as("tags"))
      .collect()
    assert(out(0).getSeq[String](0) == Seq("quick", "fox", "he")) // 'he' in 'the'
    assert(out(1).getSeq[String](0) == Seq("he")) // 'he' in 'here'
    assert(out(2).isNullAt(0))
    val sql = spark.sql(
      "SELECT multi_match('ushers walk', 'she,walk,run') AS m")
      .collect()(0).getSeq[String](0)
    assert(sql == Seq("she", "walk"))
  }
}
