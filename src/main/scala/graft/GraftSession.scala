package graft

import org.apache.spark.sql.SparkSession

/** Single wiring point for engine sessions: extensions (native functions
  * + optimizer rules) and the config every entry point needs. Callers
  * with their own session can instead set
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftSession {
  def builder(cores: String = "4"): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // pandas-parity null-on-failure semantics (see functions.Normalize)
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet ships TIMESTAMP(NANOS); see Registry.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (sources.Bucketing) land outside the repo tree;
      // per-JVM suffix so concurrent runs on one host cannot overwrite
      // each other's saveAsTable paths
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-" +
          java.lang.ProcessHandle.current().pid())
      .config("spark.ui.enabled", "false")
}
