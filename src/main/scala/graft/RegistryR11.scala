package graft

import org.apache.spark.sql.functions._

import Registry.t

/** Round-11 widening: the in-engine HTML table scan wired end-to-end
  * (S3/S4 literal parity — the page TEXT is now the input, closing the
  * last ingest delta), and incremental IVF index maintenance (the
  * missing incremental-family member beside d12/d19/t18/a33).
  */
object RegistryR11 {

  def entries: Seq[Q] = Seq(

    // ---- S12: in-engine HTML `<table>` scan — pd.read_html parity
    //      (sources/HtmlTables.scala) proven with an EXACT oracle: pages
    //      are synthesized from the documents table (10 docs per page,
    //      rows sorted by doc_id, the matchlog table inside an HTML
    //      comment — the FBref quirk — plus a numeric entity per cell
    //      and a trailing all-blank separator row), then the full S4
    //      chain parseTable → resolveColumns → na.drop runs in-engine
    //      and DuckDB replays the expected output straight from the
    //      source rows. Entity decode, comment strip, header binding,
    //      separator drop are all on the hash path. --------------------
    Q("s12_html_table_scan",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        val rowHtml = format_string(
          "<tr><td>%s</td><td><b>%s</b>&#33;</td><td>%s</td></tr>",
          col("doc_id"), col("lang"), length(col("text")))
        val pages = docs
          .groupBy((col("doc_id") % 10).as("page_id"))
          .agg(concat(
            lit("<html><body><div><!--<table id=\"log\"><thead>" +
              "<tr><th>DocKey</th><th>Lang</th><th>NChars</th></tr>" +
              "</thead><tbody>"),
            array_join(transform(
              sort_array(collect_list(struct(col("doc_id").as("k"),
                rowHtml.as("h")))), x => x.getField("h")), ""),
            lit("<tr><td></td><td></td><td></td></tr>" +
              "</tbody></table>--></div></body></html>")).as("page"))
        val wide = graft.sources.HtmlTables.parseTable(
          pages, "page", keyCols = Seq("page_id"))
        graft.sources.Ingest.cleanMatchlog(wide,
            Seq("doc_id" -> "dockey", "lang" -> "lang",
              "nchars" -> "nchars"),
            dateCol = "doc_id")
          .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
            col("nchars").cast("long").as("nchars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang || '!' AS lang,
             |  CAST(length(text) AS BIGINT) AS nchars
             |FROM documents WHERE doc_id < 100
             |ORDER BY doc_id""".stripMargin)),

    // ---- S13: WET GENERATION — the full crawl-to-corpus chain in one
    //      oracle-exact query: documents become HTML pages (script/
    //      style/comment chrome + planted entities), pages wrap into
    //      real WARC `response` records written as multi-member-gzip
    //      archives by executors (K6), the archives stream back through
    //      the record walk (s11), and HtmlTables.visibleText extracts
    //      each page's prose — exactly what CommonCrawl's WET generator
    //      does to each crawled page. DuckDB replays the expected text
    //      straight from the source rows: container round-trip, HTML
    //      stripping, entity decode, and whitespace collapse are ALL on
    //      the hash path. -----------------------------------------------
    Q("s13_wet_generation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") % 5 === 0 && col("doc_id") < 500)
        val html = format_string(
          "<html><head><script>var x = 1 < 2 && 0;</script>" +
            "<style>p { color: red }</style></head>" +
            "<body><h1>Doc %s &#8212; Q&amp;A</h1>" +
            "<!-- hidden <p>chrome</p> comment -->" +
            "<p>%s</p></body></html>",
          col("doc_id"), col("text"))
        val recs = docs.select(
          lit("response").as("warc_type"),
          concat(lit("<urn:graft:wet:"), col("doc_id"), lit(">"))
            .as("record_id"),
          concat(lit("https://example.org/page/"), col("doc_id"))
            .as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          lit("text/html").as("content_type"),
          encode(html, "UTF-8").as("payload"),
          col("doc_id"))
        val tmp = Registry.scratchDir("warc_s13")
        graft.sources.WarcIngest.writeWarcDir(
          recs.repartition(4, col("doc_id")).drop("doc_id"), tmp,
          gzip = true)
        val (records, audit) = graft.sources.WarcIngest.readWarcDir(s, tmp)
        val bad = audit.filter(col("corrupt")).count()
        require(bad == 0, s"s13: $bad corrupt archives")
        records.filter(col("warc_type") === "response")
          .select(col("record_id"),
            graft.sources.HtmlTables.visibleText(
              decode(col("payload"), "UTF-8")).as("text"))
          .orderBy("record_id")
      },
      // the em-dash ref &#8212; is outside the printable-ASCII decode
      // scope and must survive INTACT; &amp; decodes; chrome vanishes
      Some("""SELECT
             |  concat('<urn:graft:wet:', CAST(doc_id AS VARCHAR), '>')
             |    AS record_id,
             |  concat('Doc ', CAST(doc_id AS VARCHAR),
             |         ' &#8212; Q&A ', text) AS text
             |FROM documents WHERE doc_id % 5 = 0 AND doc_id < 500
             |ORDER BY record_id""".stripMargin)),

    // ---- N17: incremental IVF maintenance — the steady-state append
    //      path: centroids fit on the PRIOR corpus (vec_id < 400) only,
    //      the NEW batch assigned through the broadcast codebook
    //      (Similarity.ivfAppend — never a refit), rolled up per cell
    //      with the outlier-fraction refit signal attached. Rows-only
    //      by design (the seeded k-means fit is not SQL-expressible);
    //      the n18 portable twin replays the same append contract
    //      bit-for-bit. ------------------------------------------------
    Q("n17_ivf_append",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val prior = emb.filter(col("vec_id") < 400)
        val batch = emb.filter(col("vec_id") >= 400)
        val centroids = graft.llm.Similarity.kmeansFit(
          prior, "vec_id", "embedding", k = 16)
        val asg = graft.llm.Similarity.ivfAppend(
          batch, "vec_id", "embedding", centroids, minCos = 0.5)
        val sig = graft.llm.Similarity.ivfRefitSignal(asg,
          maxOutlierFrac = 0.25)
        asg.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_assigned"),
            sum(col("is_outlier").cast("long")).as("n_outliers"))
          .crossJoin(broadcast(sig.select(col("refit"))))
          .orderBy("cell")
      },
      None),

    // ---- N18: PORTABLE incremental-IVF twin — Forgy cells from the
    //      prior corpus, quantized-integer-cosine assignment of the new
    //      batch, outlier verdicts — every row hash-exact in DuckDB
    //      (Similarity.ivfAppendPortable). Completes the incremental
    //      family's audit story: d12/d19/t18/a33 all have exact gates;
    //      now the ANN append does too. -------------------------------
    Q("n18_ivf_append_portable",
      (s, dir) => graft.llm.Similarity.ivfAppendPortable(
          t(s, dir, "embeddings"), "vec_id", "embedding", splitId = 400L)
        .orderBy("id"),
      Some(graft.llm.Similarity.ivfAppendPortableOracleSql(
        "embeddings", "vec_id", "embedding", splitId = 400L))),

    // ---- S14: WebDataset tar-shard round trip — the de-facto container
    //      of multimodal training corpora ((key.jpg, key.txt, key.json)
    //      members grouping into samples): documents become two members
    //      per sample, executors write deterministic ustar shards (K7
    //      sink twin), the shards stream back header-by-header (checksum
    //      verified), and the WebDataset sample projection regroups the
    //      pairs. Header encode/decode, octal size fields, checksums,
    //      payload round trip and sample grouping are ALL on the hash
    //      path; DuckDB replays the expectation straight from the source
    //      rows. ----------------------------------------------------------
    Q("s14_tar_wds_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        val txt = docs.select(
          format_string("samples/%05d.txt", col("doc_id")).as("name"),
          encode(col("text"), "UTF-8").as("payload"), col("doc_id"))
        val cls = docs.select(
          format_string("samples/%05d.cls", col("doc_id")).as("name"),
          encode(col("lang"), "UTF-8").as("payload"), col("doc_id"))
        val tmp = Registry.scratchDir("tar_s14")
        graft.sources.TarIngest.writeTarDir(
          txt.unionByName(cls).repartition(4, col("doc_id"))
            .drop("doc_id"), tmp, gzip = true)
        val (members, audit) = graft.sources.TarIngest.readTarDir(s, tmp)
        val bad = audit.filter(col("corrupt")).count()
        require(bad == 0, s"s14: $bad corrupt shards")
        graft.sources.TarIngest.wdsSamples(members)
          .groupBy("sample_key")
          .agg(
            max(when(col("ext") === "txt",
              decode(col("payload"), "UTF-8"))).as("text"),
            max(when(col("ext") === "cls",
              decode(col("payload"), "UTF-8"))).as("lang"))
          .select(
            regexp_extract(col("sample_key"), "(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("lang"), col("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, text FROM documents
             |WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // ---- N19: PORTABLE distributed Lloyd k-means — the audit twin of
    //      the driver-sampled kmeansFit: the FULL corpus refines for 2
    //      rounds in one lazy plan, every centroid component (truncating
    //      integer mean), assignment and squared-L2 distance replays
    //      bit-for-bit in DuckDB. Completes the clustering audit story:
    //      Forgy ASSIGNMENT was twinned (n13/n18/d24); the refinement
    //      LOOP now is too. -----------------------------------------------
    Q("n19_kmeans_portable",
      (s, dir) => graft.llm.Similarity.kmeansLloydPortable(
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("id"),
      Some(graft.llm.Similarity.kmeansLloydPortableOracleSql(
        "embeddings", "vec_id", "embedding"))),

    // ---- T22: n-gram novelty — per-document fraction of distinct word
    //      trigrams unseen in any earlier-id document (the diversity /
    //      contribution signal data-pruning ranks on; a mirror scores ~0).
    //      Grams shuffle as 60-bit digests only; exact oracle. ------------
    Q("t22_ngram_novelty",
      (s, dir) => graft.llm.TextAnalysis.ngramNovelty(
          t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some(graft.llm.TextAnalysis.ngramNoveltyOracleSql(
        "documents", "doc_id", "text"))),

    // ---- T23: PORTABLE BPE — the audit twin of the rows-only t12 (the
    //      last untwinned rows-only gate): DuckDB re-derives the ENTIRE
    //      tokenizer INDEPENDENTLY — word frequencies, the deterministic
    //      vocab cap, all 8 training merges (pair counts + argmax +
    //      exhaustive application), and the in-rank-order encode of every
    //      word — and the hash gate proves the merge sequence AND every
    //      token bit-for-bit. The Spark side trains through the same
    //      Bpe.fit as t12 and encodes via the apply-in-order form
    //      (spec-pinned equivalent to the greedy lowest-rank loop). -----
    Q("t23_bpe_portable",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        val merges = graft.llm.Bpe.fit(docs, "text", numMerges = 8,
          maxVocabWords = 200)
        graft.llm.Bpe.encodePortable(docs, "doc_id", "text", merges)
          .select(col("id").as("doc_id"), col("n_bpe_tokens"),
            concat_ws(" ", col("tokens")).as("tokens_str"))
          .orderBy("doc_id")
      },
      Some(graft.llm.Bpe.portableOracleSql("documents", "doc_id", "text",
        maxDocId = 100L, numMerges = 8, maxVocabWords = 200))),

    // ---- M12: image metadata extract + strip THROUGH real PNG chunk
    //      arithmetic — the compliance pass before multimodal ingest:
    //      tEXt keyword/value pairs planted per image from source
    //      columns, read back via the CRC-verified chunk walk (IHDR
    //      geometry on the same hash path), and the ancillary strip
    //      proven LOSSLESS by md5-comparing strip(planted) against
    //      strip(original) while its byte cost replays analytically
    //      (12-octet chunk frame + keyword + NUL + value). -----------
    Q("m12_image_metadata",
      (s, dir) => {
        val mm = graft.llm.Multimodal
        val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("lang"),
            concat(lit("doc-"), col("doc_id")).as("author_v"))
        val imgs = mm.withSyntheticImages(docs, "doc_id")
        val withCols = imgs.join(docs, imgs("id") === docs("doc_id"))
          .select(col("id"), col("payload"), col("author_v"), col("lang"))
        val planted = mm.withPlantedText(withCols, "id", "payload",
          Seq("author" -> "author_v", "lang" -> "lang"))
        val meta = mm.pngMeta(planted, "id", "payload")
        val sp = mm.stripPngMeta(planted, "id", "payload")
          .select(col("id"), md5(col("payload")).as("strip_md5"))
        val so = mm.stripPngMeta(imgs, "id", "payload")
          .select(col("id"), md5(col("payload")).as("orig_md5"),
            col("bytes_saved").as("orig_saved"))
        meta.join(sp, "id").join(so, "id")
          .select(col("id").as("doc_id"), col("keyword"), col("value"),
            col("width"), col("height"), col("bit_depth"),
            col("color_type"),
            (col("bytes_saved") - col("orig_saved")).as("planted_bytes"),
            (col("strip_md5") === col("orig_md5")).as("restored"),
            col("corrupt"))
          .orderBy("doc_id", "keyword")
      },
      Some("""WITH mm_d AS (
             |  SELECT doc_id, lang,
             |    'doc-' || CAST(doc_id AS VARCHAR) AS author_v
             |  FROM documents WHERE doc_id < 200),
             |mm_kv AS (
             |  SELECT doc_id, lang, author_v, 'author' AS keyword,
             |    author_v AS value FROM mm_d
             |  UNION ALL
             |  SELECT doc_id, lang, author_v, 'lang', lang FROM mm_d)
             |SELECT doc_id, keyword, value,
             |  8 AS width, 8 AS height, 8 AS bit_depth, 0 AS color_type,
             |  CAST(13 + length('author') + length(author_v)
             |     + 13 + length('lang') + length(lang) AS BIGINT)
             |    AS planted_bytes,
             |  true AS restored, false AS corrupt
             |FROM mm_kv ORDER BY doc_id, keyword""".stripMargin)),

    // ---- N20: PORTABLE power iteration — the dominant principal
    //      direction of label-0's embedding covariance (the PCA-prep /
    //      drift-axis step after n11): 3 rounds of v ← normalize(C·v)
    //      in one lazy plan, the matvec kept under 2^53 by the vector
    //      scale so every normalize is exact-int-to-double + one IEEE
    //      divide — all 64 components replay bit-for-bit in DuckDB. ----
    Q("n20_power_iteration",
      (s, dir) => graft.llm.Similarity.powerIterationPortable(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label", 0)
        .orderBy("pos"),
      Some(graft.llm.Similarity.powerIterationPortableOracleSql(
        "embeddings", "vec_id", "embedding", "label", 0))),

    // ---- D28: SOFT dedup — duplicate-aware training WEIGHTS instead of
    //      drops (the D4-style reweighting): every doc keeps its row,
    //      weighted 1/|near-dup cluster| so each duplicated passage
    //      contributes one document's worth of gradient mass however
    //      many copies exist. Rides d08's exact connected components;
    //      the weight is one exact-int IEEE division. The drop-based
    //      alternatives stay d14 (keep best) / l10 (leakage-safe split).
    Q("d28_soft_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        val cc = graft.llm.Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")),
          graft.llm.Dedup.exactNgramNearDups(docs, "text", "doc_id",
            3, 0.5))
        val sizes = cc.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, "rep")
          .select(col("id"), col("rep"), col("cluster_size"),
            (lit(1.0) / col("cluster_size")).as("weight"))
          .orderBy("id")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) >= 3 THEN
             |      list_distinct(list_transform(range(1, len(toks)-1),
             |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             |    ELSE [array_to_string(toks, ' ')] END AS grams
             |  FROM (SELECT doc_id,
             |      list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |        x -> strlen(x) > 0) AS toks
             |    FROM documents WHERE doc_id < 500)),
             |sizes AS (SELECT doc_id, len(grams) AS n FROM t),
             |inv AS (SELECT doc_id, unnest(grams) AS gram FROM t),
             |cand AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |  FROM inv a JOIN inv b
             |    ON a.gram = b.gram AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |e AS (
             |  SELECT id_a AS a, id_b AS b FROM cand
             |  JOIN sizes sa ON sa.doc_id = id_a
             |  JOIN sizes sb ON sb.doc_id = id_b
             |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
             |edges AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
             |reach AS (
             |  SELECT doc_id AS src, doc_id AS dst
             |  FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.src, e2.b AS dst FROM reach r
             |  JOIN edges e2 ON r.dst = e2.a),
             |cc AS (SELECT src AS id, min(dst) AS rep FROM reach GROUP BY src),
             |cs AS (SELECT rep, count(*) AS cluster_size FROM cc GROUP BY 1)
             |SELECT cc.id, cc.rep, cs.cluster_size,
             |  CAST(1 AS DOUBLE) / cs.cluster_size AS weight
             |FROM cc JOIN cs ON cs.rep = cc.rep
             |ORDER BY cc.id""".stripMargin))
  )
}
