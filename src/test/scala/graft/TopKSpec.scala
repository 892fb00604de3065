package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** Native TopKPerKey operator (plans/TopKPerKey.scala): physical plan
  * shape, equivalence with the Window row_number formulation, partial-
  * flush correctness under a tiny key cap, and the float-key guard.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 9.0)
  ).toDF("key", "id", "score").repartition(4)

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("topKPerKey matches the Window row_number formulation") {
    for (k <- Seq(1, 2, 3, 10)) {
      val native = TopKPerKey(sample, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), k)
        .orderBy("key", "id").collect().toSeq
      val win = windowTopK(k).orderBy("key", "id").collect().toSeq
      assert(native == win, s"k=$k")
    }
  }

  test("plan is partial prune -> exchange -> sort -> final prune") {
    val df = TopKPerKey(sample, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), 2)
    df.collect() // force adaptive plan finalization
    // AQE's toString prints Final + Initial sections; audit the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("GraftTopKPerKeyPartial"), plan)
    assert(plan.contains("GraftTopKPerKeyFinal"), plan)
    // partial runs BELOW the key exchange (appears after it in tree
    // print), final above; exactly one hash exchange (the repartition(4)
    // in `sample` is round-robin, not hash)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, plan)
    assert(plan.indexOf("GraftTopKPerKeyFinal") <
      plan.indexOf("GraftTopKPerKeyPartial"), plan)
  }

  test("partial flush under a 1-key cap never loses rows") {
    // cap=1: every new key in a partition flushes the map — the final
    // stage must still produce exactly the top-k per key.
    val big = (1 to 400).map(i => (s"k${i % 13}", i.toLong, (i * 37 % 101).toDouble))
      .toDF("key", "id", "score").repartition(7)
    val native = TopKPerKey(big, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), 3, maxPartialKeys = 1)
      .orderBy("key", "id").collect().toSeq
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val win = big.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn").orderBy("key", "id").collect().toSeq
    assert(native == win)
  }

  test("ascending order and k larger than any group") {
    val native = TopKPerKey(sample, Seq(col("key")),
      Seq(col("score").asc, col("id").asc), 2)
      .orderBy("key", "id").collect().toSeq
    val w = Window.partitionBy("key").orderBy(col("score").asc, col("id").asc)
    val win = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").orderBy("key", "id").collect().toSeq
    assert(native == win)
  }

  test("null keys group together; null sort values follow SortOrder defaults") {
    val df = Seq(
      (Some("a"), 1L, Some(5.0)), (None, 2L, Some(3.0)),
      (None, 3L, Some(7.0)), (None, 4L, None), (Some("a"), 5L, None)
    ).toDF("key", "id", "score").repartition(3)
    val native = TopKPerKey(df, Seq(col("key")),
      Seq(col("score").desc, col("id").asc), 2)
      .orderBy("id").collect().toSeq
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val win = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").orderBy("id").collect().toSeq
    assert(native == win)
  }

  test("randomized parity with the Window formulation (nulls, dup scores)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val rows = (1 to 400).map { i =>
        val score: Option[Double] =
          if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(25).toDouble) // heavy ties on purpose
        (s"k${rnd.nextInt(15)}", i.toLong, score)
      }
      val df = rows.toDF("key", "id", "score")
        .repartition(1 + rnd.nextInt(8))
      for (k <- Seq(1, 2, 5)) {
        val native = TopKPerKey(df, Seq(col("key")),
          Seq(col("score").desc, col("id").asc), k,
          maxPartialKeys = 1 + rnd.nextInt(4))
          .orderBy("key", "id").collect().toSeq
        val w = Window.partitionBy("key")
          .orderBy(col("score").desc, col("id").asc)
        val win = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
          .orderBy("key", "id").collect().toSeq
        assert(native == win, s"trial=$trial k=$k")
      }
    }
  }

  test("floating-point grouping keys are rejected") {
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(sample, Seq(col("score")), Seq(col("id").asc), 1)
    }
    assert(e.getMessage.contains("floating-point"))
  }
}
