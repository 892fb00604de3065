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
      // The default 100-entry whole-stage-codegen cache thrashes on any
      // workload with more than ~10 distinct operator plans: this
      // registry compiles ~600 codegen units per 47 queries, so EVERY
      // pass recompiled ~all of them (measured: 615/627 units recompiled
      // per sweep, ~0.2-0.3 s/query of Janino+JIT). Size the cache to
      // the workload, not the demo default — the same hygiene applies to
      // any long-lived production driver/executor running a diverse
      // operator surface (guide §1.2 per-task work: don't recompile what
      // you already compiled).
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // bucketed tables (sources.Bucketing) land outside the repo tree;
      // per-JVM suffix so concurrent runs on one host cannot overwrite
      // each other's saveAsTable paths
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-" +
          java.lang.ProcessHandle.current().pid())
      .config("spark.ui.enabled", "false")
}
