package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located joins: the write-once-shuffle-never layout. */
class BucketingSpec extends SparkSpec {

  test("join of two co-bucketed tables runs with zero Exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 4)

    // Force the non-broadcast path: broadcasting would hide the property
    // under audit (bucket co-location eliminating the shuffle).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer",
        "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the right thing
      val expected = orders.join(customer, "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("groupBy on the bucket key also skips the shuffle") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(orders, "b_orders_agg", "o_custkey", 4)
    try {
      val agg = spark.table("b_orders_agg").groupBy("o_custkey")
        .agg(sum("o_totalprice").as("total"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$plan")
      assert(agg.count() ==
        orders.select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
