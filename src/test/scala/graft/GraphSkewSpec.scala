package graft

import org.apache.spark.sql.functions._

import graft.graph.{LabelPropagation, PageRank}

/** Hub-skew hardening for the graph family: a celebrity node holding
  * ~half the edges concentrates one key. The defenses asserted here:
  *
  *  - the hot per-node aggregations (PageRank's contribution sum, LPA's
  *    neighbor-label count and argmax) run as TWO-LEVEL aggregates —
  *    partial map-side combine before the exchange — so the hub's
  *    reducer receives at most one row per map partition, never one row
  *    per edge;
  *  - the edge-side shuffle join DOES split under AQE skew handling
  *    once partition sizes warrant it (spec-sized thresholds stand in
  *    for the 100 TB defaults);
  *  - and in every configuration the integer-exact results stay
  *    BIT-IDENTICAL — skew handling is a physical concern only.
  */
class GraphSkewSpec extends SparkSpec {
  import spark.implicits._

  // hub graph: node 0 RECEIVES half the edges (i -> 0) — the celebrity
  // in-hub whose contribution sum is the hot aggregate — and the other
  // half form chains (i -> i+1) so every node has degree
  private val n = 2000
  private lazy val hubEdges = ((1 to n).map(i => (i.toLong, 0L)) ++
    (1 until n).map(i => (i.toLong, (i + 1).toLong))).toDF("src", "dst")

  test("pagerank + lpa hot aggregates are two-level (map-side combine)") {
    val prPlan = PageRank.ranksInt(hubEdges, iters = 1)
      .queryExecution.executedPlan.toString
    // partial_sum before the exchange: the hub dst's contribution rows
    // pre-combine per map partition
    assert(prPlan.contains("partial_sum"), prPlan.take(800))
    val lpaPlan = LabelPropagation.labels(hubEdges, iters = 1)
      .queryExecution.executedPlan.toString
    // neighbor-label count AND the struct-min argmax both partial
    assert(lpaPlan.contains("partial_count"), lpaPlan.take(800))
    assert(lpaPlan.contains("partial_min"), lpaPlan.take(800))
  }

  test("hub-graph results are bit-identical under any partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = PageRank.ranksInt(df, iters = 3)
        .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      val l = LabelPropagation.labels(df, iters = 2)
        .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      (r, l)
    }
    val a = run(hubEdges)
    val b = run(hubEdges.repartition(17))
    val c = run(hubEdges.coalesce(1))
    assert(a == b && a == c)
    // the hub actually dominates: rank(0) far above every other node
    val ranks = a._1.toMap
    assert((1 to n).forall(i => ranks(0L) > ranks(i.toLong)),
      s"hub rank ${ranks(0L)} should dominate")
  }

  test("AQE splits the hub's join partition; results unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // a hub src with ~half of 200k edges: one shuffle partition holds
      // ~2.5 MB vs a ~80 KB median — skewed at these (spec-scaled)
      // thresholds exactly as a 100 TB hub is at the defaults
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      val m = 100000
      val edges = spark.range(0, m)
        .select(lit(0L).as("src"), col("id").as("dst"))
        .unionAll(spark.range(0, m)
          .select((col("id") % 997 + 1).as("src"), col("id").as("dst")))
      val ranks = spark.range(0, 1000)
        .select(col("id").as("src"), (col("id") * 7 % 1001).as("rank"))
      def agg(skew: Boolean) = {
        conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
        val df = edges.join(ranks, "src")
          .groupBy("dst").agg(sum("rank").as("s"))
        // execute THIS df so AQE finalizes before the plan is read
        val rows = df.collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        (rows, df.queryExecution.executedPlan.toString)
      }
      val (withSkew, planSkew) = agg(skew = true)
      val (noSkew, _) = agg(skew = false)
      assert(planSkew.contains("skew=true"),
        "AQE skew split did not fire:\n" + planSkew.take(1200))
      assert(withSkew == noSkew) // physical split, identical answer
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
