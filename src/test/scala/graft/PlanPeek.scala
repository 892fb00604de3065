package graft

/** Dev scratch: print a registry query's final adaptive plan. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    println("==== FINAL PLAN ====")
    println(df.queryExecution.executedPlan.toString)
  }
}
