package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchStore
import Registry.{events, t}

/** Round-6 widening: mergeable sketch stores (incremental distinct /
  * frequency at 100 TB), Spark 4 VARIANT ingest for schema-on-read JSON,
  * and the collection higher-order-function surface. Variant and array
  * entries are oracle-exact; the sketch entries are rows-only by nature
  * (DuckDB has no Datasketches HLL / Count-Min) but carry their exact
  * counterparts IN-ROW so the driver's check is quantitative, with the
  * mergeability law asserted bit-for-bit in `SketchStoreSpec`.
  */
object RegistryR6 {

  def entries: Seq[Q] = Seq(

    // ---- A36: HLL sketch-store rollup — distinct users per event type
    //      from per-(type, day) sketches. merged_est is computed ONLY
    //      from the sketch table (the incremental path); direct_est and
    //      exact_users recompute from raw rows to witness, in-row, that
    //      (a) sketch merge is lossless (merged == direct, the register-
    //      max law) and (b) the estimate is tight (rel_err) ---------------
    Q("a36_hll_rollup",
      (s, dir) => {
        val evd = events(s, dir).withColumn("day", to_date(col("ts")))
        val st = SketchStore.distinctSketches(
          evd, Seq("event_type", "day"), "user_id")
        val rolled = SketchStore.rollupDistinct(st, Seq("event_type"))
        val direct = evd.groupBy("event_type").agg(
          round(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
            .cast("long").as("direct_est"),
          countDistinct(col("user_id")).as("exact_users"))
        rolled.join(direct, "event_type")
          .withColumn("merge_lossless",
            col("approx_distinct") === col("direct_est"))
          .withColumn("rel_err",
            round(abs(col("approx_distinct") - col("exact_users"))
              .cast("double") / col("exact_users"), 4))
          .orderBy("event_type")
      },
      None),

    // ---- A37: Count-Min frequency probes — per-event-type estimated
    //      occurrence counts from a 0.1%-error sketch, with the exact
    //      count and the one-sided guarantee (est >= exact, overshoot
    //      <= eps*N) witnessed in-row. Fixed seed => deterministic ------
    Q("a37_cm_frequency",
      (s, dir) => {
        val ev = events(s, dir)
        val n = ev.count()
        val eps = 0.001
        val cm = SketchStore.cmBuild(ev, "event_type", eps = eps)
        val exact = ev.groupBy(col("event_type").cast("string").as("item"))
          .agg(count(lit(1)).as("exact_cnt"))
        SketchStore.cmProbe(exact.select("item"), "item", cm)
          .join(exact, "item")
          .withColumn("overestimate_ok", col("est_cnt") >= col("exact_cnt"))
          .withColumn("within_eps",
            col("est_cnt") - col("exact_cnt") <= lit((eps * n).toLong + 1))
          .orderBy("item")
      },
      None),

    // ---- S10: VARIANT ingest — schema-on-read JSON as Spark 4's binary
    //      variant type: parse once, extract typed paths (nested object,
    //      array index, boolean, JSON null, absent path). The crawl-
    //      metadata shape: producers evolve payloads freely, the engine
    //      reads any vintage without a declared schema. Oracle: DuckDB
    //      json_extract over the identical JSON text -----------------------
    Q("s10_variant_ingest",
      (s, dir) => {
        val raw = t(s, dir, "documents").select(col("doc_id"),
          concat(lit("{\"meta\":{\"lang\":\""), col("lang"),
            lit("\",\"n\":"), col("n_chars"),
            lit("},\"tags\":[\""), col("source"), lit("\",\"corpus\"],"),
            lit("\"flag\":"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("true"))
              .otherwise(lit("null")),
            lit("}")).as("raw"))
        raw.select(col("doc_id"), parse_json(col("raw")).as("v"))
          .select(col("doc_id"),
            variant_get(col("v"), "$.meta.lang", "string").as("lang"),
            variant_get(col("v"), "$.meta.n", "bigint").as("n"),
            variant_get(col("v"), "$.tags[1]", "string").as("tag1"),
            variant_get(col("v"), "$.flag", "boolean").as("flag"),
            try_variant_get(col("v"), "$.meta.missing", "bigint")
              .as("missing"))
          .orderBy("doc_id")
      },
      Some("""WITH j AS (
             |  SELECT doc_id,
             |    concat('{"meta":{"lang":"', lang, '","n":', n_chars,
             |      '},"tags":["', source, '","corpus"],"flag":',
             |      CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'null' END,
             |      '}') AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  json_extract_string(raw, '$.meta.lang') AS lang,
             |  CAST(json_extract(raw, '$.meta.n') AS BIGINT) AS n,
             |  json_extract_string(raw, '$.tags[1]') AS tag1,
             |  CAST(json_extract_string(raw, '$.flag') AS BOOLEAN) AS flag,
             |  CAST(NULL AS BIGINT) AS missing
             |FROM j ORDER BY doc_id""".stripMargin)),

    // ---- X24: collection higher-order-function surface — transform /
    //      filter / exists / forall / aggregate / zip_with / sort /
    //      distinct / slice over per-doc word arrays, all codegen'd
    //      column expressions (scan speed, zero shuffles). Integer
    //      accumulators only, so the DuckDB list_* oracle matches
    //      bit-for-bit ---------------------------------------------------
    Q("x24_array_surface",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val words = filter(split(col("text"), "\\s+"), w => w =!= "")
        val lens = transform(col("words"), w => length(w).cast("long"))
        docs.select(col("doc_id"), words.as("words"))
          .select(col("doc_id"), col("words"), lens.as("lens"))
          .select(col("doc_id"),
            size(col("words")).cast("long").as("n_words"),
            aggregate(col("lens"), lit(0L), (a, x) => a + x)
              .as("total_chars"),
            size(filter(col("words"), w => length(w) >= 7)).cast("long")
              .as("long_words"),
            exists(col("words"), w => w === "the").as("has_the"),
            forall(col("words"), w => length(w) < 40).as("all_short"),
            concat_ws(",", slice(array_sort(array_distinct(col("words"))),
              1, 3)).as("first3"),
            aggregate(zip_with(col("lens"), reverse(col("lens")),
              (a, b) => a * b), lit(0L), (a, x) => a + x).as("rev_dot"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'),
             |      w -> w <> '') AS words
             |  FROM documents),
             |l AS (
             |  SELECT doc_id, words,
             |    list_transform(words, w -> CAST(length(w) AS BIGINT))
             |      AS lens
             |  FROM d)
             |SELECT doc_id,
             |  len(words) AS n_words,
             |  CAST(list_sum(lens) AS BIGINT) AS total_chars,
             |  len(list_filter(words, w -> length(w) >= 7)) AS long_words,
             |  len(list_filter(words, w -> w = 'the')) > 0 AS has_the,
             |  len(list_filter(words, w -> length(w) >= 40)) = 0
             |    AS all_short,
             |  array_to_string(list_sort(list_distinct(words))[1:3], ',')
             |    AS first3,
             |  CAST(list_dot_product(lens, list_reverse(lens)) AS BIGINT)
             |    AS rev_dot
             |FROM l ORDER BY doc_id""".stripMargin))
  )
}
