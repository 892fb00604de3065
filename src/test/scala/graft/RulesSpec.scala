package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.plans.AliasLookupSimplification

/** Injected optimizer rule: guarded alias-map lookup → single-probe
  * coalesce form.
  */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private val aliases = Map("Spurs" -> "Tottenham", "Wolves" -> "Wanderers")

  test("injected rule fires in the production optimizer pipeline") {
    // parquet scan input: a LocalRelation would be evaluated wholesale by
    // ConvertToLocalRelation before the rule could observe anything
    val df = spark.read.parquet(s"$sf/part.parquet")
      .select(Normalize.normalizeTeamName(col("p_name"), aliases).as("team"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("CASE WHEN"), optimized)
    assert(optimized.contains("coalesce") && optimized.contains("element_at"),
      optimized)
  }

  test("rule also matches the pre-replacement (analyzed-plan) shape") {
    val df = Seq("Spurs").toDF("v")
      .select(Normalize.normalizeTeamName(col("v"), aliases).as("team"))
    val analyzed = df.queryExecution.analyzed
    assert(analyzed.expressions.map(_.toString).mkString
      .contains("CASE WHEN"))
    val s = AliasLookupSimplification(analyzed)
      .expressions.map(_.toString).mkString
    assert(!s.contains("CASE WHEN"), s)
    assert(s.contains("coalesce") && s.contains("element_at"), s)
  }

  test("rewrite is semantics-preserving (hit, miss, null input)") {
    val df = Seq(Some("Spurs"), Some("Arsenal FC"), None).toDF("v")
    val viaCase = df.select(
      Normalize.normalizeTeamName(col("v"), aliases).as("t")).collect()
    val viaCoalesce = df.select({
      val stripped = regexp_replace(trim(col("v")), "\\s+(FC|CF|AFC)$", "")
      coalesce(element_at(typedLit(aliases), stripped), stripped).as("t")
    }).collect()
    assert(viaCase.map(r => Option(r.get(0))).toSeq ==
      viaCoalesce.map(r => Option(r.get(0))).toSeq)
  }

  test("injected native functions are callable from SQL") {
    // GraftExtensions registers cosine_sim and minhash_sig via
    // injectFunction — the SparkSessionExtensions path a user session
    // reaches with spark.sql.extensions=graft.plans.GraftExtensions.
    val r = spark.sql(
      """SELECT cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c,
        |  size(minhash_sig('one two three four five', 2, 16)) AS m
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getInt(1) == 16)
  }
}
