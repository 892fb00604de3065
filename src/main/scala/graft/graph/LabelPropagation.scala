package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (community detection) — deterministic
  * variant of Raghavan et al. 2007: every node starts labeled with its
  * own id; each round it adopts the most frequent label among its
  * neighbors, ties broken by SMALLEST label. Classic async LPA is
  * run-order-dependent (useless for a reproducible pipeline); the
  * synchronous + total-tie-break form here is a pure function of the
  * graph, so a SQL unroll replays it bit-for-bit.
  *
  * Complements the other graph operators: connected components answer
  * "reachable at all", PageRank "how central", triangles "how cohesive",
  * LPA "which dense region" — the dedup-cluster refinement when CC
  * chains unrelated docs through a single shared gram.
  *
  * Scale: like [[PageRank]] the undirected message relation is built
  * and persisted ONCE; each of the k fixed rounds is one join against
  * the |nodes|-row label table + one (node, label) count + one argmax —
  * all map-side-combinable groupBys, no driver action anywhere.
  */
object LabelPropagation {

  /** @param edges (src, dst) long columns; direction ignored,
    *              self-loops dropped, multi-edges collapse
    * @return (id, label) after `iters` synchronous rounds
    */
  def labels(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "lpa: iters must be >= 1")
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val msgsSel = und.select(col("a").as("n"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("n"), col("a").as("nb")))
    // adaptive partition count, same rationale as PageRank/Bfs
    val msgs = msgsSel
      .repartition(graft.etl.Ids.adaptiveParts(msgsSel), col("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = msgs.select(col("n").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var lbl = nodes.select(col("id"), col("id").as("label"))
    var i = 0
    while (i < iters) {
      val counts = msgs
        .join(lbl.withColumnRenamed("id", "nb"), "nb")
        .groupBy(col("n"), col("label"))
        .agg(F.count(F.lit(1)).as("c"))
      // argmax by (count desc, label asc) without a window: min over the
      // (-count, label) struct is the same total order, map-side combined
      val winner = counts
        .groupBy(col("n").as("id"))
        .agg(min(struct((-col("c")).as("negc"), col("label")))
          .getField("label").as("label"))
      lbl = winner
      i += 1
    }
    lbl
  }

  /** DuckDB replay of [[labels]]; `edgeSql` yields (src, dst). */
  def oracleSql(edgeSql: String, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH raw AS ($edgeSql),
                 |und AS (
                 |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                 |  FROM raw WHERE src <> dst),
                 |msgs AS (
                 |  SELECT a AS n, b AS nb FROM und
                 |  UNION ALL SELECT b AS n, a AS nb FROM und),
                 |l0 AS (SELECT DISTINCT n AS id, n AS label FROM msgs)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(s""",
                   |l$i AS (
                   |  SELECT id, label FROM (
                   |    SELECT n AS id, label,
                   |      row_number() OVER (PARTITION BY n
                   |                         ORDER BY c DESC, label) AS rn
                   |    FROM (
                   |      SELECT m.n, p.label, count(*) AS c
                   |      FROM msgs m JOIN l${i - 1} p ON p.id = m.nb
                   |      GROUP BY m.n, p.label))
                   |  WHERE rn = 1)""".stripMargin)
    }
    sb.append(s"\nSELECT id, CAST(label AS BIGINT) AS label FROM l$iters ORDER BY id")
    sb.toString
  }
}
