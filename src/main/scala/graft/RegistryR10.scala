package graft

import org.apache.spark.sql.functions._

import Registry.{t, tf}

/** Round-10 widening: WARC/WET crawl-archive ingest (the canonical
  * 100 TB text-corpus input format) with an oracle-exact round-trip —
  * records synthesized FROM the documents table, written as real
  * multi-member-gzip WARC archives by executors, re-read through the
  * record walk, and every header field + payload md5 re-derived by
  * DuckDB from the same source rows.
  */
object RegistryR10 {

  def entries: Seq[Q] = Seq(

    // ---- S11: WARC round-trip — the engine's crawl-archive ingest
    //      (sources/WarcIngest.scala). The fixture is DATA-DERIVED and
    //      deterministic: each documents row with doc_id < 200 becomes
    //      one conversion record with arithmetic headers; executors
    //      write 4 gzip archives (one member per record, the
    //      CommonCrawl layout); readWarcDir walks them back. Output is
    //      per-RECORD (file assignment deliberately excluded — hash
    //      partition layout is an execution detail, record content is
    //      the contract). The oracle replays headers + payload md5
    //      from the raw table: bytes survived the container round-trip
    //      iff the hashes match. -------------------------------------
    Q("s11_warc_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(
            col("doc_id"),
            lit("conversion").as("warc_type"),
            concat(lit("<urn:graft:doc:"), col("doc_id"), lit(">"))
              .as("record_id"),
            concat(lit("https://example.org/doc/"), col("doc_id"))
              .as("target_uri"),
            lit("2026-01-01T00:00:00Z").as("warc_date"),
            lit("text/plain").as("content_type"),
            encode(col("text"), "UTF-8").as("payload"))
        // fixed per-JVM scratch path: rebuilt plans overwrite the same 4
        // part files instead of leaking a fresh temp dir per invocation;
        // removed on JVM exit (Registry.scratchDir)
        val tmp = Registry.scratchDir("warc_s11")
        graft.sources.WarcIngest.writeWarcDir(
          docs.repartition(4, col("doc_id")), tmp, gzip = true)
        val (records, audit) = graft.sources.WarcIngest.readWarcDir(s, tmp)
        // every archive must be healthy — a corrupt flag would silently
        // shrink the row set instead of failing the gate
        val badFiles = audit.filter(col("corrupt")).count()
        require(badFiles == 0, s"s11: $badFiles corrupt archives")
        records.select(col("record_id"), col("warc_type"),
            col("target_uri"), col("warc_date"), col("content_type"),
            col("content_length"), md5(col("payload")).as("payload_md5"))
          .orderBy("record_id")
      },
      Some("""SELECT
             |  concat('<urn:graft:doc:', CAST(doc_id AS VARCHAR), '>')
             |    AS record_id,
             |  'conversion' AS warc_type,
             |  concat('https://example.org/doc/', CAST(doc_id AS VARCHAR))
             |    AS target_uri,
             |  '2026-01-01T00:00:00Z' AS warc_date,
             |  'text/plain' AS content_type,
             |  CAST(strlen(text) AS BIGINT) AS content_length,
             |  md5(text) AS payload_md5
             |FROM documents WHERE doc_id < 200
             |ORDER BY record_id""".stripMargin)),

    // ---- N15: PORTABLE int8 scalar quantization — the audit twin of
    //      the rows-only n07 recall gate, completing the SQ member of
    //      the n-family twins (n12 LSH / n13 IVF / n14 pairs). Integer
    //      codes from truncating division, integer cosine, every
    //      verdict replays bit-for-bit. --------------------------------
    Q("n15_sq_portable",
      (s, dir) => graft.llm.Similarity.sqTopKPortable(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          queryMaxId = 5L, k = 3)
        .orderBy("query_id", "rank"),
      Some(graft.llm.Similarity.sqTopKPortableOracleSql(
        "embeddings", "vec_id", "embedding", queryMaxId = 5L, k = 3))),

    // ---- N16: PORTABLE product quantization — the audit twin of the
    //      rows-only n08 recall gate: Forgy codebooks (first-ksub
    //      subvectors by id, the n13 construction), integer subspace
    //      distances, argmin encode, equi-join ADC. The n-family is now
    //      fully twinned: brute/LSH/IVF/SQ/PQ/pairs. -------------------
    Q("n16_pq_portable",
      (s, dir) => graft.llm.Similarity.pqTopKPortable(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          queryMaxId = 5L, k = 3)
        .orderBy("query_id", "rank"),
      Some(graft.llm.Similarity.pqTopKPortableOracleSql(
        "embeddings", "vec_id", "embedding", queryMaxId = 5L, k = 3)))
  )
}
