package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the j12 scale mechanism: Spark's
  * InjectRuntimeFilter rewrites `fact ⋈ σ(dim)` so the fact scan probes
  * a bloom filter built from the filtered dim keys BEFORE the shuffle,
  * so non-matching fact rows never leave the scan stage. The production
  * thresholds are sized for multi-GB scans, so (like the DPP proof) this
  * test tunes them down to pin the MECHANISM on KB-scale test tables.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloom filter is injected into the fact side of a filtered join") {
    val confs = Seq(
      // force a shuffle join: bloom filters are never injected under a
      // broadcast, where the dim is already colocated with the scan
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // KB-sized scans fail the 10 GB application-side benefit heuristic
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val urgent = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
        s"no bloom runtime filter injected:\n$plan")
      // and the rewritten plan still computes the right join
      val expected = li.join(urgent.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
