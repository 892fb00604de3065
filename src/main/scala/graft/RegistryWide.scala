package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.{Merge, RangeJoin}
import Registry.t

/** Round-5 widening: interval-overlap join, snapshot diff, deterministic
  * corpus splits, rank-fraction windows, ORC roundtrip, model-based
  * quality filtering. Every entry here is oracle-exact (DuckDB
  * hash-match); the approximate round-5 ops (BPE / SemDeDup / IVF-PQ)
  * live in RegistryLlm with their ScalaTest quality gates.
  */
object RegistryWide {

  def entries: Seq[Q] = Seq(

    // ---- J13: interval-overlap join (interval x interval), binned ------
    // Lineitems become shipping windows [shipdate, shipdate + qty%20
    // days]; two windows of the SAME supplier that overlap are a
    // candidate batching conflict. A bare overlap predicate plans as a
    // nested loop; RangeJoin.overlapBinned replicates each interval into
    // its 30-day bins and joins (supplier, bin) equi-style, emitting each
    // pair exactly once in the bin of max(lo) — no dedup shuffle, no
    // cartesian anywhere (PlanShapeSpec pins the join mode).
    Q("j13_interval_overlap",
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .filter(col("l_quantity") >= 48)
          .select(col("l_suppkey").as("skey"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
            datediff(to_date(col("l_shipdate")), lit("1992-01-01")).as("lo"),
            (col("l_quantity").cast("int") % 20).as("span"))
          .withColumn("hi", col("lo") + col("span"))
          .drop("span")
        val a = base.select(col("skey"), col("id").as("id_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a"))
        val b = base.select(col("skey").as("skey_b"), col("id").as("id_b"),
          col("lo").as("lo_b"), col("hi").as("hi_b"))
        RangeJoin.overlapBinned(a, "lo_a", "hi_a", b, "lo_b", "hi_b",
            binWidth = 30, keys = Seq("skey"), bKeysIn = Seq("skey_b"))
          .filter(col("id_a") < col("id_b"))
          .select(col("skey"), col("id_a"), col("id_b"),
            (least(col("hi_a"), col("hi_b")) -
              greatest(col("lo_a"), col("lo_b")) + 1).as("overlap_days"))
          .orderBy("skey", "id_a", "id_b")
      },
      Some("""WITH f AS (
             |  SELECT l_suppkey AS skey,
             |    l_orderkey * 10 + l_linenumber AS id,
             |    date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
             |      AS lo,
             |    date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
             |      + CAST(l_quantity AS INT) % 20 AS hi
             |  FROM lineitem WHERE l_quantity >= 48)
             |SELECT a.skey, a.id AS id_a, b.id AS id_b,
             |  least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS overlap_days
             |FROM f a JOIN f b
             |  ON a.skey = b.skey AND a.id < b.id
             |  AND a.lo <= b.hi AND b.lo <= a.hi
             |ORDER BY 1, 2, 3""".stripMargin)),

    // ---- D15: snapshot diff — added/removed/changed/unchanged between
    //      two crawl snapshots, md5-fingerprint compare so the shuffle
    //      carries digests, never document text (etl/Merge.snapshotDiff).
    //      prev/curr are derived deterministically from `documents`:
    //      doc_id%7==0 missing from prev (-> added), %13==0 missing from
    //      curr (-> removed), %11==0 text-bumped in curr (-> changed) ----
    Q("d15_snapshot_diff",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val prev = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("text"))
        val curr = docs.filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [v2]")))
              .otherwise(col("text")).as("text"))
        Merge.snapshotDiff(prev, curr, Seq("doc_id"), Seq("text"))
          .orderBy("doc_id")
      },
      Some("""WITH prev AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
             |curr AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]'
             |         ELSE text END AS text
             |  FROM documents WHERE doc_id % 13 <> 0)
             |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN p.doc_id IS NULL THEN 'added'
             |       WHEN c.doc_id IS NULL THEN 'removed'
             |       WHEN p.text <> c.text THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ---- X21: deterministic train/val/test split — the assignment every
    //      training pipeline needs to be REPRODUCIBLE and JOIN-FREE:
    //      split(doc) is a pure function of the id (first two hex chars
    //      of md5), so any job on any day computes the same split without
    //      a membership table. ~80/10/10 via hex thresholds 0xcd/0xe6
    //      (205/16ths, 25/16ths, 26/16ths of 256 buckets) ---------------
    Q("x21_hash_split",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
        .select(col("doc_id"),
          when(col("h") < "cd", "train")
            .when(col("h") < "e6", "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
             |         THEN 'train'
             |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
             |         THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- W15: rank fractions — percent_rank + cume_dist per priority
    //      group (ANSI semantics both engines); unique (price, orderkey)
    //      order makes the doubles exact integer ratios, hash-stable ----
    Q("w15_rank_fractions",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .filter(col("o_orderkey") % 50 === 0)
          .orderBy("o_orderkey")
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_orderpriority, o_totalprice,
             |    percent_rank() OVER
             |      (PARTITION BY o_orderpriority
             |       ORDER BY o_totalprice, o_orderkey) AS pr,
             |    cume_dist() OVER
             |      (PARTITION BY o_orderpriority
             |       ORDER BY o_totalprice, o_orderkey) AS cd
             |  FROM orders)
             |WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin)),

    // ---- S7b: ORC roundtrip — the registry's parquet-independent
    //      columnar format: write nation to ORC, read it back, prove
    //      values and types survive (oracle reads the parquet directly) --
    Q("s07_orc_roundtrip",
      (s, dir) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-orc").toString
        t(s, dir, "nation").write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // ---- L9: model-based quality filter — a trained linear classifier
    //      (weights are a model artifact, here fixed constants) applied
    //      at scan speed: pure row-wise arithmetic over codegen'd
    //      features, no UDF, no shuffle. The logit (not the sigmoid) is
    //      the output so the oracle compare stays bit-exact — exp()
    //      rounding differs across engines, +*/- does not ----------------
    Q("l09_quality_logit",
      (s, dir) => {
        val txt = col("text")
        val nTok = size(split(trim(txt), "\\s+")).cast("double")
        val len = length(txt).cast("double")
        val punct = (len - length(regexp_replace(txt, "[.,!?]", ""))
          .cast("double")) / len
        val upper = (len - length(regexp_replace(txt, "[A-Z]", ""))
          .cast("double")) / len
        t(s, dir, "documents")
          .filter(length(txt) > 0)
          .select(col("doc_id"),
            (((nTok * 0.01) - (punct * 3.0)) + (upper * 1.5)).as("logit"))
          .withColumn("keep", (col("logit") > 0.4).cast("int"))
          .orderBy("doc_id")
      },
      // DuckDB decimal-point literals are DECIMALs (exact arithmetic);
      // Spark's are doubles — force ::DOUBLE so both engines round
      // identically at every step.
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS DOUBLE) AS ntok,
             |    CAST(length(text) AS DOUBLE) AS len,
             |    CAST(length(text)
             |      - length(regexp_replace(text, '[.,!?]', '', 'g'))
             |      AS DOUBLE) AS np,
             |    CAST(length(text)
             |      - length(regexp_replace(text, '[A-Z]', '', 'g'))
             |      AS DOUBLE) AS nu
             |  FROM documents WHERE length(text) > 0)
             |SELECT doc_id,
             |  ((ntok * 0.01::DOUBLE) - ((np / len) * 3.0::DOUBLE))
             |    + ((nu / len) * 1.5::DOUBLE) AS logit,
             |  CAST((((ntok * 0.01::DOUBLE) - ((np / len) * 3.0::DOUBLE))
             |    + ((nu / len) * 1.5::DOUBLE)) > 0.4::DOUBLE AS INT)
             |    AS keep
             |FROM f ORDER BY doc_id""".stripMargin))
  )
}
