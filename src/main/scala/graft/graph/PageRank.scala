package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic PageRank over an edge DataFrame — the second iterative
  * graph operator next to `Dedup.connectedComponents` (SURVEY §2.11).
  *
  * All arithmetic is INTEGER (scaled fixed-point): ranks start at
  * `scale`, each round every node sends `rank div outDegree` along each
  * outgoing edge, and receives `scale*15/100 + 85*Σincoming/100`. With
  * only integer div/sum the result is bit-identical on any engine and
  * any partitioning — a DuckDB SQL unroll replays it exactly (g01's
  * oracle), which double-precision PageRank can never do (summation
  * order). Precision: scale=1e9 keeps 9 fractional digits; headroom is
  * sound for graphs up to ~1e8 nodes (85 * N * scale < 2^63).
  *
  * Semantics fixed for replayability:
  *  - multi-edges each carry a share (no implicit dedup);
  *  - self-loops are ordinary edges;
  *  - dangling mass LEAKS (the classic simplification — no global
  *    redistribution term, so no extra all-reduce per round);
  *  - a fixed iteration count, NO convergence test — unlike CC there is
  *    no driver-side action per round: the k rounds build one lazy plan
  *    each, with persist/unpersist on the rank snapshots only.
  *
  * Scale design (100 TB): the edge set is the big side and it is
  * hash-partitioned by `src` ONCE and persisted; each round shuffles
  * only the rank table (|nodes| rows — orders of magnitude smaller than
  * the edges) to meet it, then aggregates contributions by `dst`
  * (map-side combine). Rounds are independent shuffles of the SMALL
  * side; the 100 TB edge relation never re-shuffles.
  */
object PageRank {

  /** @param edges DataFrame with long columns `src`, `dst`
    * @param seeds  optional teleport predicate over `id` — None is
    *               classic PageRank (every node receives the 15% base);
    *               Some(pred) is PERSONALIZED PageRank: only seed nodes
    *               get teleport mass (and the initial rank), everything
    *               else earns rank purely by proximity to seeds
    * @return DataFrame (id: long, rank: long) — scaled fixed-point
    */
  def ranksInt(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
               seeds: Option[Column] = None): DataFrame = {
    require(iters >= 1, "pagerank: iters must be >= 1")
    val eSel = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // partition count derived from the edge relation's size estimate
    // (Ids.adaptiveParts): an explicit repartition(col) is AQE-exempt,
    // so a fixed count pins shuffle.partitions tasks onto every round's
    // passes even when the graph is small; result is partition-
    // independent (exact integer sums)
    val e = eSel.repartition(graft.etl.Ids.adaptiveParts(eSel), col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val base = scale * 15L / 100L
    val baseTerm: Column =
      seeds.map(p => when(p, lit(base)).otherwise(lit(0L))).getOrElse(lit(base))
    val initTerm: Column =
      seeds.map(p => when(p, lit(scale)).otherwise(lit(0L))).getOrElse(lit(scale))
    // The whole k-round computation is ONE lazy plan: no action, no
    // driver sync anywhere (the O(diameter)-rounds-with-a-count() trap
    // CC had before large-star). Lineage is linear in iters — for very
    // large iteration counts callers should checkpoint periodically, but
    // PageRank converges geometrically (0.85^k), so useful k stays small.
    var ranks = nodes.select(col("id"), initTerm.cast("long").as("rank"))
    var i = 0
    while (i < iters) {
      // rank side joins INTO the src-partitioned edges; contributions
      // aggregate by dst with partial (map-side) sums.
      val contrib = e
        .join(outDeg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum("c").as("in_sum"))
      ranks = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          // `div`, not `/`: Spark's `/` on BIGINT yields DOUBLE — the
          // whole point is staying in exact integer arithmetic
          (baseTerm +
            expr("(85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100"))
            .cast("long").as("rank"))
      i += 1
    }
    ranks
  }

  /** DuckDB replay of [[ranksInt]]: unrolled CTE chain, one `r{i}` per
    * iteration, same integer expressions (`//` = `div`: both truncate
    * toward zero). `edgeSql` must yield columns (src, dst); `seedPred`
    * (over `id`/`n.id`) mirrors the personalized variant.
    */
  def oracleSql(edgeSql: String, iters: Int, scale: Long = 1000000000L,
                seedPred: Option[String] = None): String = {
    val base = scale * 15L / 100L
    val baseSql = seedPred
      .map(p => s"CASE WHEN $p THEN $base ELSE 0 END")
      .getOrElse(base.toString)
    val initSql = seedPred
      .map(p => s"CASE WHEN $p THEN $scale ELSE 0 END")
      .getOrElse(scale.toString)
    val sb = new StringBuilder
    sb.append(s"""WITH edges AS ($edgeSql),
                 |outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
                 |nodes AS (SELECT DISTINCT src AS id FROM edges
                 |          UNION SELECT DISTINCT dst FROM edges),
                 |r0 AS (SELECT id, CAST($initSql AS BIGINT) AS rank FROM nodes)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
                   |r$i AS (
                   |  SELECT n.id, CAST(($baseSql) + 85 * COALESCE(s.in_sum, 0) // 100
                   |               AS BIGINT) AS rank
                   |  FROM nodes n LEFT JOIN (
                   |    SELECT e.dst AS sid,
                   |      CAST(sum(r.rank // o.deg) AS BIGINT) AS in_sum
                   |    FROM edges e
                   |    JOIN outd o ON o.src = e.src
                   |    JOIN r${i - 1} r ON r.id = e.src
                   |    GROUP BY e.dst) s ON s.sid = n.id)""".stripMargin)
    }
    sb.append(s"\nSELECT id, rank FROM r$iters ORDER BY id")
    sb.toString
  }
}
