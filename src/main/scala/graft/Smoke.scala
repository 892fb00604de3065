package graft
import org.apache.spark.sql.SparkSession

/** t1-style smoke: run the flagship `SparkEntry.entry` under a DEFAULT
  * session config (notably Spark 4's ANSI mode ON — the driver's session,
  * not ours), proving entry() is ANSI-safe. Prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // deliberately a PLAIN session (no graft extensions, ANSI on) —
    // the driver's t1 smoke uses its own session, so entry() must not
    // depend on our extensions or configs
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n ansi=${spark.conf.get("spark.sql.ansi.enabled")}")
    spark.stop()
  }
}
