package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Exact triangle counting with DEGREE ORIENTATION — the third graph
  * operator beside connected components and PageRank.
  *
  * The naive 3-way edge self-join explodes on skew: one celebrity node
  * of degree d contributes d² wedges. Orienting every undirected edge
  * from its lower-(degree, id) endpoint to the higher one turns the
  * graph into a DAG whose out-degrees are O(√m), so the wedge join —
  * the only superlinear step — is bounded by Σ out-deg² = O(m^1.5)
  * TOTAL, independent of how skewed the raw degrees are (the standard
  * node-iterator++ bound). Each triangle {x<y<z} then exists exactly
  * once as wedge (x→y, x→z) closed by edge (y→z): no de-dup pass, no
  * global ordering structure — ties in degree break by node id, carried
  * inline as (deg, id) tuple comparisons, so there is NO global rank
  * window anywhere.
  *
  * Everything is integer counts — bit-exact on any engine; the oracle
  * replays the same orientation in SQL row-value comparisons.
  */
object Triangles {

  /** @param edges DataFrame with long columns `src`, `dst` (direction
    *              ignored; self-loops dropped; multi-edges collapse)
    * @return single row (n_edges, n_wedges, n_triangles) — BIGINTs
    */
  def count(edges: DataFrame): DataFrame = {
    // und feeds deg + orientation + the edge count; ori feeds the wedge
    // join twice and the closing join — plan-lifetime caches (released
    // by the harness clearCache), not recomputation per reference
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: deg feeds BOTH degree-attach joins (da and db) — without
    // the cache the union+groupBy (and its exchange) runs twice. The two
    // joins themselves are inherent: attaching per-node degrees to both
    // endpoints of every edge is two equi-joins on different keys (at
    // this scale AQE broadcasts deg; at 100 TB they become SMJs, which is
    // the right plan — deg is |nodes| rows, far smaller than edges).
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(F.count(F.lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ori = und
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("db")).otherwise(col("da")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e1 = ori.as("e1"); val e2 = ori.as("e2")
    val wedges = e1.join(e2, col("e1.u") === col("e2.u") &&
        struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.v").as("y"), col("e2.v").as("z"))
    val tri = wedges
      .join(ori.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
      .agg(F.count(F.lit(1)).as("n_triangles"))
    // wedge COUNT comes analytically from out-degrees (Σ C(outdeg, 2)),
    // so the wedge join itself materializes exactly once, for the
    // triangle-closing join — never a second pass just to count it
    val nWedges = ori.groupBy("u").agg(F.count(F.lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("n_wedges"))
    und.agg(F.count(F.lit(1)).as("n_edges"))
      .crossJoin(broadcast(nWedges))
      .crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  /** DuckDB replay of [[count]]; `edgeSql` yields (src, dst). */
  def oracleSql(edgeSql: String): String =
    s"""WITH raw AS ($edgeSql),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM raw WHERE src <> dst),
       |deg AS (
       |  SELECT id, count(*) AS d FROM (
       |    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY id),
       |ori AS (
       |  SELECT CASE WHEN (da.d, und.a) < (db.d, und.b)
       |           THEN und.a ELSE und.b END AS u,
       |         CASE WHEN (da.d, und.a) < (db.d, und.b)
       |           THEN und.b ELSE und.a END AS v,
       |         CASE WHEN (da.d, und.a) < (db.d, und.b)
       |           THEN db.d ELSE da.d END AS dv
       |  FROM und
       |  JOIN deg da ON da.id = und.a
       |  JOIN deg db ON db.id = und.b),
       |wedge AS (
       |  SELECT e1.v AS y, e1.dv AS dy, e2.v AS z, e2.dv AS dz
       |  FROM ori e1 JOIN ori e2
       |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)),
       |tri AS (
       |  SELECT count(*) AS n FROM wedge w
       |  JOIN ori e ON e.u = w.y AND e.v = w.z),
       |nw AS (
       |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n FROM (
       |    SELECT u, count(*) AS c FROM ori GROUP BY u))
       |SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       |  nw.n AS n_wedges,
       |  CAST(tri.n AS BIGINT) AS n_triangles
       |FROM tri, nw""".stripMargin
}
