package graft

import org.apache.spark.sql.functions._

import Registry.t

/** Round-15 widening: the training-shard manifest (the final mile from
  * packed bins to the files a training job mounts), the in-engine
  * TRAINED quality classifier (fixed-iteration integer logistic
  * regression, every iteration oracle-replayed), and the multimodal
  * end-to-end chain (TAR/WebDataset container → decode → metadata
  * strip → perceptual dedup → canonical election → caption join →
  * interleaved packing — the LAION/DataComp shape, l22's image twin).
  */
object RegistryR15 {

  def entries: Seq[Q] = Seq(

    // ---- L23: training-shard MANIFEST — the artifact a training job
    //      reads: l06's packed bins ride a deterministic shard
    //      assignment (Knuth multiplicative hash of the bin key, the
    //      mixSources/u11 integer discipline) and each shard emits one
    //      manifest row: bin count, doc count, token count, and an
    //      ORDER-INDEPENDENT content checksum (48-bit md5 summands
    //      reduced mod 1e9+7 — exact BIGINT arithmetic, partition-
    //      order-proof, replayed bit-for-bit by the oracle). Upstream
    //      everything is hash-gated; this gates the last hop. Scale:
    //      one skinny-row shuffle (the shard groupBy); text never
    //      moves. The byte-stable FILE sink is spec-gated
    //      (ShardManifestSpec, the K5/WARC golden-hash posture). ------
    Q("l23_shard_manifest",
      (s, dir) => {
        val blocks = graft.llm.CorpusPipeline.packSequences(
          t(s, dir, "documents"), capacity = 120, blockSize = 256)
        graft.llm.ShardManifest.manifest(blocks, nShards = 7)
          .orderBy("shard")
      },
      Some("""WITH RECURSIVE n AS (
             |  SELECT doc_id, doc_id // 256 AS block,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      t -> strlen(t) > 0)) AS BIGINT) AS nt,
             |    row_number() OVER (PARTITION BY doc_id // 256
             |      ORDER BY doc_id) AS rn
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, block, nt, rn, 0 AS bin, nt AS bt
             |  FROM n WHERE rn = 1
             |  UNION ALL
             |  SELECT n.doc_id, n.block, n.nt, n.rn,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bin ELSE p.bin + 1 END,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bt + n.nt ELSE n.nt END
             |  FROM p JOIN n ON n.block = p.block AND n.rn = p.rn + 1),
             |b AS (
             |  SELECT doc_id, nt, block * 10000 + bin AS bkey,
             |    ((((block * 10000 + bin) % 100000) * 2654435761)
             |      % 100000) % 7 AS shard
             |  FROM p),
             |h AS (
             |  SELECT shard, bkey, nt,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
             |      || ':' || CAST(nt AS VARCHAR)), 1, 12)) AS BIGINT)
             |      % 1000000007 AS hh
             |  FROM b)
             |SELECT shard, CAST(count(DISTINCT bkey) AS BIGINT) AS n_bins,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS n_tokens,
             |  CAST(sum(hh) % 1000000007 AS BIGINT) AS checksum
             |FROM h GROUP BY shard ORDER BY shard""".stripMargin)),

    // ---- T34: in-engine TRAINED quality classifier — fixed-iteration
    //      batch-GD logistic regression on hashed unigram buckets
    //      (t27's fixture: deterministic 70% md5 train split, partial
    //      planted class signal on even ids), with ZERO IEEE ops: the
    //      integer fast-sigmoid and truncating-division updates keep
    //      every margin, gradient and weight in exact BIGINT micro
    //      units, so the oracle replays ALL 10 iterations bit-for-bit
    //      (llm/LogReg.oracleCtes). Held-out docs come back with
    //      label/score/pred/correct — the l09 scoring shape, now with
    //      the WEIGHTS trained in-engine instead of fixed. Scale: the
    //      count table shuffles once and is cached; each iteration is
    //      a broadcast of ≤257 weight rows + one doc-keyed join; the
    //      per-round driver round-trip is the ≤257-row gradient.
    //      Features are bucket PRESENCE (see LogReg.hashedCounts):
    //      held-out accuracy 0.71 vs the 0.55 majority baseline —
    //      a trained filter that actually discriminates. --------
    Q("t34_logreg_quality",
      (s, dir) => {
        val lr = graft.llm.LogReg
        val docs = t(s, dir, "documents").select(col("doc_id"),
          (conv(substring(md5(concat(lit("t34:"), col("doc_id"))),
            1, 15), 16, 10).cast("long") % 100 < 70).as("is_train"),
          (col("lang") === "en").as("is_pos"),
          concat(col("text"), when(col("doc_id") % 2 === 0,
            concat(lit(" m"), col("lang"))).otherwise(lit("")))
            .as("text"))
        val train = lr.hashedCounts(docs.filter(col("is_train")),
          "doc_id", "is_pos", "text", buckets = 256)
        val heldout = lr.hashedCounts(docs.filter(!col("is_train")),
          "doc_id", "is_pos", "text", buckets = 256)
        val w = lr.fit(train, iters = 10, lrDen = 4L)
        lr.margins(heldout, w)
          .select(col("id").as("doc_id"),
            col("y").cast("int").as("label"),
            col("m").as("score_micro"),
            (col("m") > 0).cast("int").as("pred"),
            ((col("m") > 0) === col("y")).cast("int").as("correct"))
          .orderBy("doc_id")
      },
      Some {
        val ctes = graft.llm.LogReg.oracleCtes(buckets = 256, iters = 10,
          lrDen = 4L)
        s"""WITH lr_d AS (
           |  SELECT doc_id,
           |    (CAST(concat('0x', substr(md5('t34:' ||
           |       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           |       % 100) < 70 AS is_train,
           |    lang = 'en' AS is_pos,
           |    list_filter(string_split_regex(trim(lower(
           |      text || CASE WHEN doc_id % 2 = 0
           |        THEN ' m' || lang ELSE '' END)), '\\s+'),
           |      x -> strlen(x) > 0) AS ts
           |  FROM documents),
           |${ctes.mkString(",\n")}
           |SELECT doc_id, label, score_micro, pred, correct
           |FROM lr_out ORDER BY doc_id""".stripMargin
      }),

    // ---- M18: the MULTIMODAL end-to-end chain — l22's image twin,
    //      the published LAION/DataComp pipeline from the CONTAINER:
    //      executor-written TAR/WebDataset shards (s14's layout: a
    //      .png and a .txt caption member per sample) → PNG metadata
    //      extraction proving the planted GPS payload SURVIVED the
    //      container round-trip (2_gps_seen) → ancillary strip INSIDE
    //      the chain, proven lossless against a strip of the pristine
    //      encode (3_strip_restored) → perceptual dHash over the
    //      STRIPPED bytes (planted cross-scale duplicates: key mod 25,
    //      second half pixel-doubled — m14's plant) → connected
    //      components over STAR edges → canonical election by DECODED
    //      width (m17's rule) → caption join from the container's .txt
    //      members → interleaved image-text packing (64 image tokens +
    //      caption tokens per sample, l06's greedy fold). One (stage,
    //      n_rows) hash gate; DuckDB replays every stage transition —
    //      cluster count via the recursive closure, block count via
    //      the pack CTE over the elected canonicals — from source
    //      rows, so drift anywhere (a GPS tag lost, a strip that
    //      changed pixels, a closure or election flip, a bin seam)
    //      breaks the gate. Pixels never shuffle: hashes, widths and
    //      token counts travel; payloads stay scan-side. --------------
    Q("m18_multimodal_chain",
      (s, dir) => {
        val mm = graft.llm.Multimodal
        val docsAll = t(s, dir, "documents").filter(col("doc_id") < 150)
        val ids = docsAll.select(col("doc_id").cast("long").as("id"),
          (col("doc_id") % 25).as("key"),
          when(col("doc_id") < 75, 1).otherwise(2).as("scale"))
        val pristine = mm.withSyntheticImagesScaled(ids, "id", "key",
          "scale", baseW = 36, baseH = 32)
        val gpsVals = docsAll.select(col("doc_id").cast("long").as("id"),
          format_string("lat=%d;lon=%d",
            col("doc_id") * 1003 % 180000000L - 90000000L,
            col("doc_id") * 2017 % 360000000L - 180000000L).as("gps_v"))
        val planted = mm.withPlantedText(
          pristine.join(gpsVals, "id"), "id", "payload",
          Seq("gps" -> "gps_v"))
        val tarIn = planted
          .select(col("id"),
            format_string("img/%05d.png", col("id")).as("name"),
            col("payload"))
          .unionByName(docsAll.select(col("doc_id").cast("long").as("id"),
            format_string("img/%05d.txt", col("doc_id")).as("name"),
            encode(coalesce(col("text"), lit("")), "UTF-8").as("payload")))
        val tmp = Registry.scratchDir("m18_tar")
        graft.sources.TarIngest.writeTarDir(
          tarIn.repartition(4, col("id")).drop("id"), tmp, gzip = true)
        val (members, audit) = graft.sources.TarIngest.readTarDir(s, tmp)
        require(audit.filter(col("corrupt")).count() == 0,
          "m18: corrupt shards")
        // persisted (harness scope): the TAR re-streams per action and
        // five stages hang off the sample frame — one container decode
        val samples = CacheScope.harness.track(
          graft.sources.TarIngest.wdsSamples(members)).toDF()
        val pngs = samples.filter(col("ext") === "png")
          .select(regexp_extract(col("sample_key"), "(\\d+)$", 1)
            .cast("long").as("id"), col("payload"))
        val caps = samples.filter(col("ext") === "txt")
          .select(regexp_extract(col("sample_key"), "(\\d+)$", 1)
            .cast("long").as("id"),
            decode(col("payload"), "UTF-8").as("caption"))
        val gpsSeen = mm.pngMeta(pngs, "id", "payload")
          .filter(col("keyword") === "gps")
          .join(gpsVals, "id")
          .filter(col("value") === col("gps_v"))
        // strip INSIDE the chain, on the container bytes; pinned — the
        // dHash, the width decode and the restored-proof all read it
        val stripped = CacheScope.harness.track(
          mm.stripPngMeta(pngs, "id", "payload")
            .select(col("id"), col("payload"))).toDF()
        val restored = stripped
          .select(col("id"), md5(col("payload")).as("m1"))
          .join(mm.stripPngMeta(pristine, "id", "payload")
            .select(col("id"), md5(col("payload")).as("m0")), "id")
          .filter(col("m1") === col("m0"))
        val hashed = mm.dhashes(stripped, "id")
          .filter(col("dhash").isNotNull)
        val cc = graft.llm.Dedup.connectedComponents(
          hashed.select(col("id")),
          graft.llm.Dedup.starEdges(hashed, "dhash", "id"))
        val meta = mm.decodeImageFeatures(stripped, "id")
          .select(col("id"), col("width").cast("long").as("width"))
        // m17's rule through the map-side-combinable argmax election —
        // never a rank window over the connected-components rep key
        val canonical = graft.llm.Dedup.electCanonical(
            cc.join(meta, "id"), "rep", "id", "width")
          .select(col("rep"), col("canonical"))
        val withCap = canonical
          .join(caps, canonical("canonical") === caps("id"))
        val counts = withCap.select(col("canonical").as("doc_id"),
          (lit(64L) + graft.llm.TextAnalysis.tokenCount(col("caption")))
            .as("n_tokens"))
        val packed = graft.llm.CorpusPipeline.packByCount(counts,
          capacity = 256, blockSize = 8)
        def stage(name: String, df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame =
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(name).as("stage"), col("n_rows"))
        // stage 0 counts the CACHED sample frame (one row per member —
        // wdsSamples is a per-member annotation), not `members`, which
        // would re-stream the archives for one count (the l22 lesson)
        stage("0_tar_members", samples)
          .union(samples.agg(countDistinct(col("sample_key"))
              .as("n_rows"))
            .select(lit("1_samples").as("stage"), col("n_rows")))
          .union(stage("2_gps_seen", gpsSeen))
          .union(stage("3_strip_restored", restored))
          .union(stage("4_canonical", canonical))
          .union(stage("5_caption_join", withCap))
          .union(packed.agg(countDistinct(
              col("block") * 10000L + col("bin")).as("n_rows"))
            .select(lit("6_blocks").as("stage"), col("n_rows")))
          .union(counts.agg(sum(col("n_tokens")).as("n_rows"))
            .select(lit("7_tokens").as("stage"), col("n_rows")))
          .orderBy("stage")
      },
      Some("""WITH RECURSIVE ids AS (
             |  SELECT doc_id AS id, doc_id % 25 AS key,
             |    CASE WHEN doc_id < 75 THEN 1 ELSE 2 END AS scale
             |  FROM documents WHERE doc_id < 150),
             |e AS (
             |  SELECT a.id AS a, b.id AS b FROM ids a JOIN ids b
             |  ON a.key = b.key AND a.id <> b.id),
             |reach AS (
             |  SELECT id AS src, id AS dst FROM ids
             |  UNION
             |  SELECT r.src, e.b AS dst FROM reach r
             |  JOIN e ON r.dst = e.a),
             |cc AS (SELECT src AS id, min(dst) AS rep FROM reach
             |       GROUP BY src),
             |rk AS (
             |  SELECT rep, id,
             |    row_number() OVER (PARTITION BY rep
             |      ORDER BY 36 * i.scale DESC, id) AS rk
             |  FROM cc JOIN ids i USING (id)),
             |canon AS (SELECT rep, id FROM rk WHERE rk = 1),
             |cnt AS (
             |  SELECT c.id AS doc_id,
             |    64 + CAST(len(list_filter(string_split_regex(
             |      trim(coalesce(d.text, '')), '\s+'),
             |      t -> strlen(t) > 0)) AS BIGINT) AS nt
             |  FROM canon c JOIN documents d ON d.doc_id = c.id),
             |pk_n AS (
             |  SELECT doc_id, doc_id // 8 AS block, nt,
             |    row_number() OVER (PARTITION BY doc_id // 8
             |      ORDER BY doc_id) AS rn
             |  FROM cnt),
             |pk_p AS (
             |  SELECT doc_id, block, nt, rn, 0 AS bin, nt AS bt
             |  FROM pk_n WHERE rn = 1
             |  UNION ALL
             |  SELECT n.doc_id, n.block, n.nt, n.rn,
             |    CASE WHEN p.bt + n.nt <= 256 THEN p.bin ELSE p.bin + 1
             |      END,
             |    CASE WHEN p.bt + n.nt <= 256 THEN p.bt + n.nt ELSE n.nt
             |      END
             |  FROM pk_p p JOIN pk_n n
             |    ON n.block = p.block AND n.rn = p.rn + 1)
             |SELECT stage, n_rows FROM (
             |  SELECT '0_tar_members' AS stage,
             |    CAST(2 * count(*) AS BIGINT) AS n_rows FROM ids
             |  UNION ALL SELECT '1_samples', CAST(count(*) AS BIGINT)
             |    FROM ids
             |  UNION ALL SELECT '2_gps_seen', CAST(count(*) AS BIGINT)
             |    FROM ids
             |  UNION ALL SELECT '3_strip_restored',
             |    CAST(count(*) AS BIGINT) FROM ids
             |  UNION ALL SELECT '4_canonical',
             |    CAST(count(DISTINCT rep) AS BIGINT) FROM cc
             |  UNION ALL SELECT '5_caption_join',
             |    CAST(count(*) AS BIGINT) FROM canon
             |  UNION ALL SELECT '6_blocks',
             |    CAST(count(DISTINCT block * 10000 + bin) AS BIGINT)
             |    FROM pk_p
             |  UNION ALL SELECT '7_tokens',
             |    CAST(sum(nt) AS BIGINT) FROM cnt)
             |ORDER BY stage""".stripMargin)),

    // ---- D35: the degenerate-key pair VALVE, oracle-gated — the
    //      maxGroupSize cap on pairsWithinGroups with its
    //      conservative-miss contract on the hash path (the d06 hot-
    //      gram cap got the same treatment in its probe rows): one
    //      planted hot key (every 3rd doc) exceeds the cap and emits
    //      NOTHING — never a partial cluster — while bounded keys keep
    //      their exact ordered pair sets. At 100 TB this is the knob
    //      that keeps one solid-color-thumbnail perceptual hash from
    //      emitting 10¹² pairs; the oracle pins exactly what the cap
    //      drops. ---------------------------------------------------
    Q("d35_capped_pairs",
      (s, dir) => {
        val keyed = t(s, dir, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id").cast("long").as("id"),
            when(col("doc_id") % 3 === 0, lit("hot"))
              .otherwise(concat(lit("k"), col("doc_id") % 20)).as("key"))
        graft.llm.Dedup.pairsWithinGroups(keyed, "key", "id",
            maxGroupSize = 50)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (
             |  SELECT doc_id AS id,
             |    CASE WHEN doc_id % 3 = 0 THEN 'hot'
             |      ELSE 'k' || CAST(doc_id % 20 AS VARCHAR) END AS key
             |  FROM documents WHERE doc_id < 300),
             |sz AS (SELECT key, count(*) AS n FROM k GROUP BY key),
             |ok AS (SELECT k.id, k.key FROM k JOIN sz USING (key)
             |       WHERE sz.n <= 50)
             |SELECT a.id AS id_a, b.id AS id_b
             |FROM ok a JOIN ok b ON a.key = b.key AND a.id < b.id
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- L24: INCREMENTAL manifest maintenance — the steady-state
    //      form of l23 (the t32/t33 discipline applied to the final
    //      mile): per-(shard, bin) stats are the mergeable granularity
    //      (doc/token counts and the mod-P checksum all fold by
    //      grouped addition, bins may span batches), so the manifest a
    //      training job reads stays current as the corpus grows
    //      without rescanning packed history. Batches align to pack-
    //      block boundaries (block = id div blockSize is id-derived
    //      and packing is per-block, so block-aligned batches pack
    //      identically to the whole-corpus pack). This entry drives
    //      the full protocol — pack batch 1 (doc_id < 256, exactly
    //      block 0) → persist bin stats → load → fold batch 2's stats
    //      in → persist → load → roll up — against l23's WHOLE-corpus
    //      replay: the hash match proves fold+persist lossless (the
    //      t18 trick). -----------------------------------------------
    Q("l24_manifest_incremental",
      (s, dir) => {
        val sm = graft.llm.ShardManifest
        val docs = t(s, dir, "documents")
        def stats(lo: Long, hi: Long) = sm.binStats(
          graft.llm.CorpusPipeline.packSequences(
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
            capacity = 120, blockSize = 256), nShards = 7)
        val tmp = Registry.scratchDir("sm_l24")
        sm.saveBinStats(stats(0L, 256L), s"$tmp/b1")
        sm.saveBinStats(sm.mergeBinStats(sm.loadBinStats(s, s"$tmp/b1"),
          stats(256L, 1000000L)), s"$tmp/b2")
        sm.manifestFromBinStats(sm.loadBinStats(s, s"$tmp/b2"))
          .orderBy("shard")
      },
      Some("""WITH RECURSIVE n AS (
             |  SELECT doc_id, doc_id // 256 AS block,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      t -> strlen(t) > 0)) AS BIGINT) AS nt,
             |    row_number() OVER (PARTITION BY doc_id // 256
             |      ORDER BY doc_id) AS rn
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, block, nt, rn, 0 AS bin, nt AS bt
             |  FROM n WHERE rn = 1
             |  UNION ALL
             |  SELECT n.doc_id, n.block, n.nt, n.rn,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bin ELSE p.bin + 1 END,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bt + n.nt ELSE n.nt END
             |  FROM p JOIN n ON n.block = p.block AND n.rn = p.rn + 1),
             |b AS (
             |  SELECT doc_id, nt, block * 10000 + bin AS bkey,
             |    ((((block * 10000 + bin) % 100000) * 2654435761)
             |      % 100000) % 7 AS shard
             |  FROM p),
             |h AS (
             |  SELECT shard, bkey, nt,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
             |      || ':' || CAST(nt AS VARCHAR)), 1, 12)) AS BIGINT)
             |      % 1000000007 AS hh
             |  FROM b)
             |SELECT shard, CAST(count(DISTINCT bkey) AS BIGINT) AS n_bins,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nt) AS BIGINT) AS n_tokens,
             |  CAST(sum(hh) % 1000000007 AS BIGINT) AS checksum
             |FROM h GROUP BY shard ORDER BY shard""".stripMargin))
,

    // ---- L25: SIZE-BALANCED shard assignment — the alternative final
    //      mile when bins are heavy-tailed (l23's hash assignment gives
    //      each shard ~equal BIN COUNTS; this gives ~equal TOKEN MASS):
    //      bins in (block, bin) order are cut into contiguous
    //      token-mass ranges, shard = (mass before the bin) * N div
    //      total — every shard carries ~total/N tokens ± one bin. The
    //      cumulative mass rides the DISTRIBUTED runningTotal (range
    //      partition + broadcast offsets); the oracle IS the window
    //      form, so the gate proves the distributed assignment
    //      identical (the u11 trick). ---------------------------------
    Q("l25_balanced_shards",
      (s, dir) => {
        val packed = graft.llm.CorpusPipeline.packSequences(
          t(s, dir, "documents"), capacity = 120, blockSize = 256)
        val bins = packed.groupBy(col("block"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"))
        graft.llm.ShardManifest.balancedShards(bins, nShards = 7)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_bins"),
            sum(col("n_docs")).as("n_docs"),
            sum(col("bin_tokens")).as("n_tokens"))
          .orderBy("shard")
      },
      Some("""WITH RECURSIVE n AS (
             |  SELECT doc_id, doc_id // 256 AS block,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      t -> strlen(t) > 0)) AS BIGINT) AS nt,
             |    row_number() OVER (PARTITION BY doc_id // 256
             |      ORDER BY doc_id) AS rn
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, block, nt, rn, 0 AS bin, nt AS bt
             |  FROM n WHERE rn = 1
             |  UNION ALL
             |  SELECT n.doc_id, n.block, n.nt, n.rn,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bin ELSE p.bin + 1 END,
             |    CASE WHEN p.bt + n.nt <= 120 THEN p.bt + n.nt ELSE n.nt END
             |  FROM p JOIN n ON n.block = p.block AND n.rn = p.rn + 1),
             |bins AS (
             |  SELECT block, bin, count(*) AS nd,
             |    CAST(sum(nt) AS BIGINT) AS bt
             |  FROM p GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(bt) AS BIGINT) AS t FROM bins),
             |c AS (
             |  SELECT block, bin, nd, bt,
             |    CAST(sum(bt) OVER (ORDER BY block, bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM bins),
             |sh AS (
             |  SELECT nd, bt,
             |    least(CAST(6 AS BIGINT),
             |      CAST(((cum - bt) * 7) // t AS BIGINT)) AS shard
             |  FROM c, tot)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
             |  CAST(sum(nd) AS BIGINT) AS n_docs,
             |  CAST(sum(bt) AS BIGINT) AS n_tokens
             |FROM sh GROUP BY shard ORDER BY shard""".stripMargin)),

    // ---- L26: TRAINED-filter corpus chain — t34's classifier DRIVING
    //      a corpus build (the published quality-filter-then-pack
    //      shape: CCNet/LLaMA train a filter on a labeled slice, score
    //      the web crawl, keep the keepers, pack what survives): fit
    //      the integer logistic regression on the deterministic 70%
    //      labeled split, score the REST from the trained weights,
    //      keep predicted-positive documents, greedy-pack the keepers
    //      into 512-token bins. The gate is the PACKED ASSIGNMENT —
    //      the oracle replays the whole composition (all 10 GD
    //      iterations, every verdict, the pack walk), so a weight
    //      flip, a verdict drift or a bin seam anywhere breaks it. ----
    Q("l26_trained_filter_chain",
      (s, dir) => {
        val lr = graft.llm.LogReg
        val docs = t(s, dir, "documents").select(col("doc_id"),
          (conv(substring(md5(concat(lit("l26:"), col("doc_id"))),
            1, 15), 16, 10).cast("long") % 100 < 70).as("is_train"),
          (col("lang") === "en").as("is_pos"),
          concat(col("text"), when(col("doc_id") % 2 === 0,
            concat(lit(" m"), col("lang"))).otherwise(lit("")))
            .as("text"))
        val train = lr.hashedCounts(docs.filter(col("is_train")),
          "doc_id", "is_pos", "text", buckets = 256)
        val rest = lr.hashedCounts(docs.filter(!col("is_train")),
          "doc_id", "is_pos", "text", buckets = 256)
        val w = lr.fit(train, iters = 10, lrDen = 4L)
        val kept = lr.margins(rest, w).filter(col("m") > 0)
          .select(col("id").as("doc_id"))
        val counts = kept.join(docs, "doc_id")
          .select(col("doc_id"),
            graft.llm.TextAnalysis.tokenCount(col("text"))
              .as("n_tokens"))
        graft.llm.CorpusPipeline.packByCount(counts,
            capacity = 512, blockSize = 32)
          .select(col("doc_id"), col("block"),
            col("bin").cast("long").as("bin"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some {
        val ctes = graft.llm.LogReg.oracleCtes(buckets = 256, iters = 10,
          lrDen = 4L)
        s"""WITH RECURSIVE lr_d AS (
           |  SELECT doc_id,
           |    (CAST(concat('0x', substr(md5('l26:' ||
           |       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           |       % 100) < 70 AS is_train,
           |    lang = 'en' AS is_pos,
           |    list_filter(string_split_regex(trim(lower(
           |      text || CASE WHEN doc_id % 2 = 0
           |        THEN ' m' || lang ELSE '' END)), '\\s+'),
           |      x -> strlen(x) > 0) AS ts
           |  FROM documents),
           |${ctes.mkString(",\n")},
           |sel AS (SELECT doc_id FROM lr_out WHERE pred = 1),
           |txt AS (
           |  SELECT d.doc_id,
           |    d.text || CASE WHEN d.doc_id % 2 = 0
           |      THEN ' m' || d.lang ELSE '' END AS text
           |  FROM documents d JOIN sel USING (doc_id)),
           |pk_n AS (
           |  SELECT doc_id, doc_id // 32 AS block,
           |    CAST(len(list_filter(string_split_regex(trim(text),
           |      '\\s+'), x -> strlen(x) > 0)) AS BIGINT) AS nt,
           |    row_number() OVER (PARTITION BY doc_id // 32
           |      ORDER BY doc_id) AS rn
           |  FROM txt),
           |pk_p AS (
           |  SELECT doc_id, block, nt, rn, 0 AS bin, nt AS bt
           |  FROM pk_n WHERE rn = 1
           |  UNION ALL
           |  SELECT n.doc_id, n.block, n.nt, n.rn,
           |    CASE WHEN p.bt + n.nt <= 512 THEN p.bin ELSE p.bin + 1
           |      END,
           |    CASE WHEN p.bt + n.nt <= 512 THEN p.bt + n.nt ELSE n.nt
           |      END
           |  FROM pk_p p JOIN pk_n n
           |    ON n.block = p.block AND n.rn = p.rn + 1)
           |SELECT doc_id, block, CAST(bin AS BIGINT) AS bin,
           |  nt AS n_tokens
           |FROM pk_p ORDER BY doc_id""".stripMargin
      })

  )
}
