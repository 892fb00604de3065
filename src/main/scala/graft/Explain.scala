package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints `explain("formatted")` for the headline
  * queries so scan pruning / pushdown / join strategies can be reviewed
  * (builder-brief requirement: iterate on the plan, not just the result).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSet else Set[String]()
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names.contains(q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
