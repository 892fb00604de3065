package graft

import org.apache.spark.sql.SparkSession

import Registry.t

/** The five TPC-H shapes that need `partsupp` — Q2, Q9, Q11, Q16, Q20 —
  * previously documented as unexpressible because the driver's testdata
  * does not generate that table. Closed here by SYNTHESIZING partsupp
  * deterministically from the part table in BOTH engines (the dbgen
  * recipe adapted so distinctness holds at EVERY scale factor: each
  * part lists 4 suppliers at stride `25 + (partkey/100) mod 20`, which
  * keeps the stride in [25, 44] — never ≡ 0 or 50 (mod 100) — so
  * `j·stride mod 100` is pairwise distinct for j = 0..3 and every part
  * provably gets 4 distinct suppliers (dbgen's own unbounded
  * `S/4 + partkey/S` stride collapses to 1–2 suppliers whenever it
  * hits a multiple of 50, which first happens at partkey 2500 — inside
  * the sf0.1 key space); availqty and an integer-cents
  * supplycost are modular functions of (partkey, j)). Every query then
  * has an EXACT DuckDB oracle over the identical synthesized relation —
  * the battery's money math stays in integer units end to end.
  *
  * These five shapes pin Catalyst behaviors nothing else in the battery
  * reaches: Q2's correlated scalar subquery over a FOUR-table body,
  * Q11's scalar subquery in HAVING, Q16's NOT IN + count(DISTINCT)
  * after it, Q20's IN whose subquery nests a correlated scalar agg two
  * levels deep.
  */
object RegistryTpchPs {

  /** Spark-side synthesized partsupp, registered as `g_partsupp`. */
  private def views(s: SparkSession, dir: String,
                    tables: Seq[String]): Unit = {
    tables.foreach(n => t(s, dir, n).createOrReplaceTempView(s"g_$n"))
    s.sql("""
      SELECT p_partkey AS ps_partkey,
        CAST((p_partkey + j * (25 + (p_partkey div 100) % 20)) % 100 AS BIGINT)
          AS ps_suppkey,
        CAST((p_partkey * 7 + j * 13) % 9999 + 1 AS BIGINT)
          AS ps_availqty,
        CAST((p_partkey * 97 + j * 31) % 99000 + 1000 AS BIGINT)
          AS ps_supplycost_cents
      FROM g_part CROSS JOIN (SELECT explode(sequence(0, 3)) AS j)
      """).createOrReplaceTempView("g_partsupp")
  }

  /** The identical synthesis as a DuckDB CTE (`//` = integer floor
    * division on BIGINT operands, positive here, = Spark `div`).
    */
  private val psCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    CAST((p_partkey + j * (25 + (p_partkey // 100) % 20)) % 100 AS BIGINT)
      |      AS ps_suppkey,
      |    CAST((p_partkey * 7 + j * 13) % 9999 + 1 AS BIGINT)
      |      AS ps_availqty,
      |    CAST((p_partkey * 97 + j * 31) % 99000 + 1000 AS BIGINT)
      |      AS ps_supplycost_cents
      |  FROM part, (SELECT unnest(range(4)) AS j) jj)""".stripMargin

  def entries: Seq[Q] = Seq(

    // ---- J37: TPC-H Q2 (minimum-cost supplier) — the battery's deepest
    //      correlated SCALAR subquery: the min supplycost is computed
    //      over a four-table body (partsupp⋈supplier⋈nation⋈region)
    //      correlated on the outer part. Catalyst must decorrelate it to
    //      one per-part aggregate of the region-filtered partsupp and
    //      join it back — per-row re-execution would be the scale
    //      killer. LIMIT rides a total order (acctbal DESC then unique
    //      name/part tiebreaks). ------------------------------------------
    Q("j37_tpch_q2",
      (s, dir) => {
        views(s, dir, Seq("part", "supplier", "nation", "region"))
        s.sql("""
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
            ps_supplycost_cents
          FROM g_partsupp, g_supplier, g_nation, g_region, g_part
          WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
            AND p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY'
            AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
            AND ps_supplycost_cents = (
              SELECT min(ps2.ps_supplycost_cents)
              FROM g_partsupp ps2, g_supplier s2, g_nation n2, g_region r2
              WHERE ps2.ps_partkey = p_partkey
                AND s2.s_suppkey = ps2.ps_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'EUROPE')
          ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          LIMIT 100""")
      },
      Some(s"""WITH $psCte
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             |  ps_supplycost_cents
             |FROM partsupp, supplier, nation, region, part
             |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
             |  AND p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY'
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'EUROPE'
             |  AND ps_supplycost_cents = (
             |    SELECT min(ps2.ps_supplycost_cents)
             |    FROM partsupp ps2, supplier s2, nation n2, region r2
             |    WHERE ps2.ps_partkey = p_partkey
             |      AND s2.s_suppkey = ps2.ps_suppkey
             |      AND s2.s_nationkey = n2.n_nationkey
             |      AND n2.n_regionkey = r2.r_regionkey
             |      AND r2.r_name = 'EUROPE')
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // ---- J38: TPC-H Q9 (product-type profit) — the six-table profit
    //      join with TWO fact-side money streams: revenue in the
    //      battery's exact cent×percent integer units MINUS
    //      supplycost·quantity scaled to the same 1e4 units, so the
    //      whole profit sum is associative integer math; grouped by
    //      nation and order year. ------------------------------------------
    Q("j38_tpch_q9",
      (s, dir) => {
        views(s, dir,
          Seq("part", "supplier", "lineitem", "orders", "nation"))
        s.sql("""
          SELECT n_name AS nation, year(o_orderdate) AS o_year,
            CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))
                   * CAST(round((1 - l_discount) * 100) AS DECIMAL(38,0))
                 - ps_supplycost_cents
                   * CAST(l_quantity AS DECIMAL(38,0)) * 100)
              AS DOUBLE) / 10000.0 AS profit
          FROM g_part, g_supplier, g_lineitem, g_partsupp, g_orders,
            g_nation
          WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
            AND ps_partkey = l_partkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%'
          GROUP BY 1, 2 ORDER BY nation, o_year DESC""")
      },
      Some(s"""WITH $psCte
             |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT)
             |    AS o_year,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |         * CAST(round((1 - l_discount) * 100) AS HUGEINT)
             |       - ps_supplycost_cents
             |         * CAST(l_quantity AS BIGINT) * 100)
             |    AS DOUBLE) / 10000.0 AS profit
             |FROM part, supplier, lineitem, partsupp, orders, nation
             |WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
             |  AND ps_partkey = l_partkey AND p_partkey = l_partkey
             |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
             |  AND p_name LIKE '%red%'
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // ---- J39: TPC-H Q11 (important stock) — scalar subquery in
    //      HAVING: per-part inventory value within one nation versus a
    //      fraction of the nation's total. Exact integer comparison —
    //      the published `value > total × fraction` becomes
    //      `value × 400 > total` (no float threshold; bounds keep the
    //      products under 2^63). -------------------------------------------
    Q("j39_tpch_q11",
      (s, dir) => {
        views(s, dir, Seq("part", "supplier", "nation"))
        s.sql("""
          SELECT ps_partkey,
            sum(ps_supplycost_cents * ps_availqty) AS value_units
          FROM g_partsupp, g_supplier, g_nation
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_9'
          GROUP BY ps_partkey
          HAVING sum(ps_supplycost_cents * ps_availqty) * 400 > (
            SELECT sum(ps_supplycost_cents * ps_availqty)
            FROM g_partsupp, g_supplier, g_nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_9')
          ORDER BY value_units DESC, ps_partkey""")
      },
      Some(s"""WITH $psCte
             |SELECT ps_partkey,
             |  CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
             |    AS value_units
             |FROM partsupp, supplier, nation
             |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |  AND n_name = 'NATION_9'
             |GROUP BY ps_partkey
             |HAVING sum(ps_supplycost_cents * ps_availqty) * 400 > (
             |  SELECT sum(ps_supplycost_cents * ps_availqty)
             |  FROM partsupp, supplier, nation
             |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |    AND n_name = 'NATION_9')
             |ORDER BY value_units DESC, ps_partkey""".stripMargin)),

    // ---- J40: TPC-H Q16 (parts/supplier relationship) — NOT IN over a
    //      filtered supplier subquery (the complaint exclusion, adapted
    //      to this dataset's negative-balance suppliers) feeding a
    //      count(DISTINCT) rollup. Single-distinct per aggregate — no
    //      Expand (the a31 multi-distinct trap does not apply). -----------
    Q("j40_tpch_q16",
      (s, dir) => {
        views(s, dir, Seq("part", "supplier"))
        s.sql("""
          SELECT p_brand, p_type, p_size,
            count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM g_partsupp, g_part
          WHERE p_partkey = ps_partkey
            AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
            AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
            AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM g_supplier WHERE s_acctbal < 0)
          GROUP BY p_brand, p_type, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
      },
      Some(s"""WITH $psCte
             |SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
             |FROM partsupp, part
             |WHERE p_partkey = ps_partkey
             |  AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
             |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
             |  AND ps_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin)),

    // ---- J41: TPC-H Q20 (potential part promotion) — the deepest
    //      nesting in the battery: IN whose subquery carries a
    //      correlated scalar aggregate on BOTH partsupp keys (half the
    //      year's shipped quantity for THAT part from THAT supplier),
    //      itself filtered by another IN. The half-quantity threshold
    //      is exact: `availqty > 0.5·sum` ⇔ `availqty·2 > sum` in
    //      integers; an empty correlated group yields NULL and the
    //      comparison drops the row in both engines (the published
    //      semantics). -----------------------------------------------------
    Q("j41_tpch_q20",
      (s, dir) => {
        views(s, dir, Seq("part", "supplier", "lineitem", "nation"))
        s.sql("""
          SELECT s_name, s_acctbal
          FROM g_supplier, g_nation
          WHERE s_suppkey IN (
              SELECT ps_suppkey FROM g_partsupp
              WHERE ps_partkey IN (
                  SELECT p_partkey FROM g_part WHERE p_name LIKE 'red%')
                AND ps_availqty * 2 > (
                  SELECT sum(CAST(l_quantity AS BIGINT))
                  FROM g_lineitem
                  WHERE l_partkey = ps_partkey
                    AND l_suppkey = ps_suppkey
                    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'))
            AND s_nationkey = n_nationkey
            AND n_name IN ('NATION_9', 'NATION_11', 'NATION_6')
          ORDER BY s_name""")
      },
      Some(s"""WITH $psCte
             |SELECT s_name, s_acctbal
             |FROM supplier, nation
             |WHERE s_suppkey IN (
             |    SELECT ps_suppkey FROM partsupp
             |    WHERE ps_partkey IN (
             |        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             |      AND ps_availqty * 2 > (
             |        SELECT sum(CAST(l_quantity AS BIGINT))
             |        FROM lineitem
             |        WHERE l_partkey = ps_partkey
             |          AND l_suppkey = ps_suppkey
             |          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             |          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'))
             |  AND s_nationkey = n_nationkey
             |  AND n_name IN ('NATION_9', 'NATION_11', 'NATION_6')
             |ORDER BY s_name""".stripMargin))
  )
}
