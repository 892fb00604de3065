package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled in Registry (RegistryCore relational
  * inventory, RegistryScalars X1–X17, RegistryLlm LLM-pipeline ops).
  */
object SparkEntry {
  /** Flagship: the reference's core combined query (J1 + A1–A3 + W1 + P3 +
    * X11 — `utils/data_utils.py:122-191`) on sf0.001; driver smoke-checks
    * rows>0. ANSI-safe (no parse/cast that can throw).
    */
  def entry(spark: SparkSession): DataFrame =
    RegistryCore.combinedQuery(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-hash LSH internals) → driver records rows-only checks.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
