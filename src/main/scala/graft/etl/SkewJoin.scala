package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting.
  *
  * A hot join key sends every one of its fact rows to a single shuffle
  * partition; one straggler task then dominates the stage. Salting
  * restores balance: each fact row gets a deterministic salt in
  * [0, salts) derived from a unique row id, the (small) build side is
  * replicated once per salt value, and the join key becomes
  * (key, salt) — a hot key's rows now spread over `salts` partitions.
  * The result is row-for-row identical to the unsalted join.
  *
  * This is the manual form of what AQE skew-join handles adaptively
  * (spark.sql.adaptive.skewJoin): AQE only splits sort-merge partitions
  * at runtime, while salting also covers the hash-join and
  * pre-aggregation cases and works on any Spark deployment. At 100 TB,
  * prefer AQE first and reach for salting when a key's row count alone
  * exceeds a task's memory.
  */
object SkewJoin {

  /** Inner equi-join of a (possibly skewed) fact to a small dim.
    *
    * @param fact     large side; may have arbitrarily hot `key` values
    * @param dim      small side, replicated `salts` times — keep it
    *                 broadcast-sized or size `salts` accordingly
    * @param key      equi-join column present on both sides
    * @param factId   any fact column with high cardinality (need not be
    *                 unique) — source of the deterministic salt
    * @param salts    number of salt buckets (> 0)
    */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
             factId: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(col(factId)), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
