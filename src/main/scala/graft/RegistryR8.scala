package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Ranking, TextAnalysis}
import Registry.t

/** Round-8 widening: retrieval-style corpus scoring (BM25), scan-speed
  * intra-document repetition removal, exact group-wise OLS regression,
  * deterministic hash-stratified sampling, and exact-integer audio
  * window energy over the real WAV decode path. Every entry is
  * oracle-exact — including the float outputs, which follow the repo's
  * determinism rules (exact integer/decimal aggregates into fixed-order
  * row-wise double arithmetic; round(…, 9) only where libm `ln` can
  * diverge in the last ulp).
  */
object RegistryR8 {

  /** BM25 query terms for t14 — mid-frequency corpus words, so idf
    * actually separates documents.
    */
  private val Bm25Terms = Seq("spark", "merge", "window")

  def entries: Seq[Q] = Seq(

    // ---- T14: BM25 relevance of every document against a fixed query —
    //      domain-targeted data mining. One codegen scan for tf/dl (no
    //      explode), one broadcast one-row corpus-stats aggregate: two
    //      jobs, corpus never shuffles, any corpus size. ----------------
    Q("t14_bm25",
      (s, dir) => Ranking.bm25(t(s, dir, "documents"), "text", "doc_id",
          Bm25Terms)
        .withColumnRenamed("id", "doc_id").orderBy("doc_id"),
      Some(Ranking.bm25OracleSql("documents", "text", "doc_id", Bm25Terms))),

    // ---- T15: intra-document repetition removal — drop repeated tokens,
    //      keep first-occurrence order. Engine path is a pure column
    //      expression (array_distinct keeps first occurrence): scan
    //      speed, zero shuffle. The oracle replays first-occurrence
    //      order via min(position) + ordered string_agg. ----------------
    Q("t15_dedup_tokens",
      (s, dir) => {
        val toks = TextAnalysis.tokens(lower(col("text")))
        t(s, dir, "documents").select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(TextAnalysis.dedupTokens(lower(col("text"))))
              .cast("long").as("n_unique"),
            concat_ws(" ", TextAnalysis.dedupTokens(lower(col("text"))))
              .as("dedup_text"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |      x -> strlen(x) > 0) AS lt
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, unnest(lt) AS w,
             |    unnest(range(len(lt))) AS i
             |  FROM toks),
             |firsts AS (
             |  SELECT doc_id, w, min(i) AS fp FROM pos GROUP BY 1, 2),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_unique,
             |    string_agg(w, ' ' ORDER BY fp) AS dedup_text
             |  FROM firsts GROUP BY 1)
             |SELECT t.doc_id, CAST(len(t.lt) AS BIGINT) AS n_tokens,
             |  CAST(coalesce(a.n_unique, 0) AS BIGINT) AS n_unique,
             |  coalesce(a.dedup_text, '') AS dedup_text
             |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ---- A41: group-wise OLS regression (price ~ quantity per return
    //      flag) — the ML-feature agg shape. Exact: integer cents as
    //      DECIMAL(18,0) (wide enough for any row value; products and
    //      sums widen toward DECIMAL(38,0) identically on both engines;
    //      one shuffle, partial aggregation), then the closed-form slope /
    //      intercept as fixed-order IEEE double arithmetic — identical
    //      bits on both engines, no rounding needed. --------------------
    Q("a41_group_ols",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_returnflag"),
          round(col("l_quantity") * 100).cast("decimal(18,0)").as("x"),
          round(col("l_extendedprice") * 100).cast("decimal(18,0)").as("y"))
        val g = li.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"))
        val nd = col("n").cast("double")
        val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
        val sxy = col("sxy").cast("double")
        val sx2 = col("sx2").cast("double")
        val slope = (nd * sxy - sx * sy) / (nd * sx2 - sx * sx)
        g.select(col("l_returnflag"), col("n"),
            slope.as("slope"),
            ((sy - slope * sx) / nd).as("intercept"))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |    CAST(round(l_quantity * 100) AS DECIMAL(18,0)) AS x,
             |    CAST(round(l_extendedprice * 100) AS DECIMAL(18,0)) AS y
             |  FROM lineitem),
             |g AS (
             |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             |    CAST(sum(x * y) AS DOUBLE) AS sxy,
             |    CAST(sum(x * x) AS DOUBLE) AS sx2
             |  FROM c GROUP BY 1)
             |SELECT l_returnflag, n,
             |  (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
             |  (sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n
             |    AS intercept
             |FROM g ORDER BY l_returnflag""".stripMargin)),

    // ---- A42: deterministic hash-stratified sample — exactly k rows per
    //      stratum, chosen by smallest md5 of the key: reproducible
    //      across runs/engines (the property a19's random sample can't
    //      give an oracle), and the at-scale sampling idiom (hash order
    //      is data-independent, no RNG state to coordinate). -------------
    Q("a42_hash_stratified_sample",
      (s, dir) => {
        val h = md5(col("o_orderkey").cast("string"))
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(h.asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("sample_hash", h)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
            col("o_orderkey"), col("sample_hash"))
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, sample_hash FROM (
             |  SELECT o_orderpriority, o_orderkey,
             |    md5(CAST(o_orderkey AS VARCHAR)) AS sample_hash,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
             |      AS BIGINT) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // ---- M10: EXACT windowed audio energy over the REAL WAV decode —
    //      synthesize deterministic PCM per doc, walk the RIFF container,
    //      and emit per-window Σ amplitude² as BIGINT. The oracle
    //      recomputes the same integers analytically from the synth
    //      formula: the decode chain hash-matches bit-for-bit, which the
    //      float RMS of m07 can never do across engines. ----------------
    Q("m10_audio_energy",
      (s, dir) => {
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
          .filter(col("id") < 200)
        Multimodal.audioWindowEnergy(
            Multimodal.withSyntheticAudio(ids, "id"), "id", windows = 10)
          .select(col("id").as("doc_id"), col("win"), col("energy"))
          .orderBy("doc_id", "win")
      },
      Some("""SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
             |  CAST(i // 100 AS INT) AS win,
             |  CAST(sum(((d.doc_id * 31 + i * 7) % 65536 - 32768)
             |           * ((d.doc_id * 31 + i * 7) % 65536 - 32768))
             |    AS BIGINT) AS energy
             |FROM documents d, range(1000) t(i)
             |WHERE d.doc_id < 200
             |GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin))
  )
}
