package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-flight pipeline instrumentation with `observe()`: gate metrics
  * (rows in, drop counts) accumulate DURING the one real pass instead of
  * a second scan — at 100 TB, `cleanStats`-style recounting is a full
  * extra read of the corpus, while an Observation is free: the metrics
  * ride the action that runs anyway.
  */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observe() yields gate metrics from the single real pass") {
    val obs = Observation("quality-gate")
    val docs = Seq(
      (1L, "a perfectly fine document"),
      (2L, ""),
      (3L, "another good one")
    ).toDF("doc_id", "text")
    val survivors = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(length(col("text")) === 0, 1L).otherwise(0L))
          .as("empty_docs"))
      .filter(length(col("text")) > 0)
    assert(survivors.count() == 2)          // the one real action
    val m = obs.get                          // metrics rode along
    assert(m("rows_in") == 3L, m.toString)
    assert(m("empty_docs") == 1L, m.toString)
  }
}
