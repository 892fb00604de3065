package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.CorpusPipeline

/** Pins the SHUFFLE SHAPE of the corpus operators — the property that
  * actually decides whether they survive a 100 TB run. Counting Exchange
  * nodes in the physical plan is deliberate: a regression that slips in
  * an extra shuffle (or loses a broadcast) changes the plan string even
  * when 500-row results stay correct.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
  private lazy val docs = (0L until 100L).map(i =>
    (i, words(10 + (i % 5).toInt), s"src${i % 3}"))
    .toDF("doc_id", "text", "source")

  private def exchanges(df: DataFrame): Int =
    "(?i)exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).size

  test("mixSources is a pure filter: zero shuffles") {
    assert(exchanges(CorpusPipeline.mixSources(docs,
      Map("src1" -> 0.5))) == 0)
  }

  test("shuffleOrder plans a RANGE partitioning, not a single sort task") {
    val plan = CorpusPipeline.shuffleOrder(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") ||
      plan.toLowerCase.contains("range"), plan.take(400))
  }

  test("sampleToTokenBudget: one shuffle (the per-source window)") {
    assert(exchanges(CorpusPipeline.sampleToTokenBudget(docs, 60L)) == 1)
  }

  test("packSequences: one shuffle (the block groupBy)") {
    // partial aggregation makes collect_list's shuffle a single Exchange;
    // the fold itself is per-task
    assert(exchanges(CorpusPipeline.packSequences(docs, 30)) == 1)
  }

  test("decontaminate probes eval grams via BROADCAST, anti-joins back") {
    val evalDocs = docs.filter(col("doc_id") < 10)
    val train = docs.filter(col("doc_id") >= 10)
    val plan = CorpusPipeline.decontaminate(train, evalDocs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(plan.contains("LeftAnti"), plan.take(400))
    // the training side is never globally sorted or range-shuffled —
    // only the eval-distinct and the anti-join keys move
    assert(!plan.toLowerCase.contains("rangepartitioning"))
  }
}
