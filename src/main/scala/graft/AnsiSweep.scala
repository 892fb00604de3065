package graft

/** ANSI-mode sweep: run every registry query under `spark.sql.ansi.enabled=
  * true` (the Spark 4 DEFAULT users get) and report which throw — the
  * throwing-cast/overflow audit for the whole surface, not just entry().
  */
object AnsiSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder()
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"[ansi-fail] $name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
      CacheScope.harness.release()
      spark.catalog.clearCache()
    }
    println(s"[ansi-sweep] failures: $bad of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
