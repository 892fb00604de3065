package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** Two-pass exact heavy hitters: nomination guarantee, memory bound,
  * and exactness of the final counts.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("space-saving never holds more than cap counters and keeps the heavy item") {
    // 900 occurrences of 'hot' interleaved with 300 distinct cold items
    val stream = (0 until 300).flatMap(i =>
      Seq("hot", s"cold$i", "hot", "hot"))
    val out = HeavyHitters
      .spaceSavingCandidates(stream.iterator, cap = 16).toSeq
    assert(out.size <= 16)
    assert(out.contains("hot"),
      "an item with freq 3N/4 must survive a width-16 sketch")
  }

  test("topK == plain groupBy top-k on a skewed corpus") {
    val rnd = new scala.util.Random(5)
    // Zipf-ish: token t_j appears ~ 2000/j times
    val rows = (1 to 40).flatMap(j =>
      Seq.fill(2000 / j)(s"t$j")) ++ (0 until 500).map(i => s"rare$i")
    val df = rnd.shuffle(rows).toDF("token").repartition(8)
    val got = HeavyHitters.topK(df, "token", k = 10)
      .as[(String, Long)].collect().toSeq
    val want = df.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(10).as[(String, Long)].collect().toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("topK widens the cap when the k-th count is below the nomination bar") {
    // Near-uniform counts (2..4 each over 400 distinct items, N≈1200):
    // with cap=8 the N/8=150 bar exceeds EVERY count, so no run can be
    // certified at that width — the exactness check must reject it and
    // the widen loop must still converge to the exact group-by answer
    // (terminating via the kept-every-distinct-item certificate).
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).flatMap(i => Seq.fill(2 + (i % 3))(f"u$i%03d"))
    val df = rnd.shuffle(rows).toDF("token").repartition(8)
    val got = HeavyHitters.topK(df, "token", k = 10, cap = 8)
      .as[(String, Long)].collect().toSeq
    val want = df.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(10).as[(String, Long)].collect().toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("nomination bar: items above N/cap are always in the candidate set") {
    val rows = Seq.fill(400)("heavy") ++ (0 until 600).map(i => s"x$i")
    val df = rows.toDF("token").repartition(4)
    val spark2 = spark
    import spark2.implicits._
    val cands = df.select(col("token").cast("string")).as[String]
      .mapPartitions(it =>
        HeavyHitters.spaceSavingCandidates(it, 8))
      .collect().toSet
    // freq 400 of N=1000 > N/8: must be nominated from some partition
    assert(cands.contains("heavy"))
  }
}
