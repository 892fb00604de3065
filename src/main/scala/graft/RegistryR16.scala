package graft

import org.apache.spark.sql.functions._

import Registry.{t, tf}

/** Round-16 widening: the trained-classifier ARTIFACT (fit once →
  * persist → score forever, the posture every sibling artifact already
  * has) and the audio/video end-to-end chain (m18's remaining-modality
  * twin: WebDataset shards carrying WAV + MJPEG AVI → real RIFF decode
  * → duration-invariant envelope dedup → longest-rendition election →
  * scene-cut features → caption join → packing).
  */
object RegistryR16 {

  def entries: Seq[Q] = Seq(

    // ---- T35: PERSISTED trained classifier — t34's logistic regression
    //      through the fit-once/score-forever protocol every sibling
    //      artifact has (BPE merges, Unigram vocab, KN stats, BM25):
    //      fit on the labeled 70% split → saveWeights (parquet, ≤257
    //      rows) → loadWeights → score the held-out batch FROM THE
    //      LOADED ARTIFACT. The oracle replays the ENTIRE fit (all 10
    //      integer-GD iterations) and the held-out scoring — identical
    //      to t34's — so the hash match PROVES the parquet round trip
    //      lossless: a single weight bit lost in persistence flips a
    //      margin and breaks the gate. At 100 TB: the production
    //      quality filter trains once and is applied to every later
    //      drop; without this artifact the l26 chain refits per run. --
    Q("t35_logreg_persisted",
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
        val tmp = Registry.scratchDir("lr_t35")
        lr.saveWeights(s, lr.fit(train, iters = 10, lrDen = 4L),
          s"$tmp/w")
        val w = lr.loadWeights(s, s"$tmp/w")
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

    // ---- M19: the AUDIO/VIDEO end-to-end chain — m18's twin for the
    //      remaining modalities, the LAION-audio/video shape from the
    //      CONTAINER: executor-written TAR/WebDataset shards carrying a
    //      .wav, an .avi and a .txt caption per sample → WAV bytes
    //      proven restored bit-for-bit through the container round trip
    //      (2_wav_restored) → real RIFF/PCM decode to the DURATION-
    //      INVARIANT envelope (per-window truncating mean energy —
    //      planted cross-duration duplicates: same key mod 25, second
    //      half integer-upsampled 2×, so envelopes collide while bytes
    //      and durations differ) → star-edge connected components →
    //      LONGEST-RENDITION canonical election via the argmax
    //      aggregate (never a rank window; 6_canonical_idsum pins the
    //      exact winners, not just their count) → real MJPEG/AVI
    //      container walk to m11's scene-cut features (4_scene_cuts,
    //      replayed analytically from the planted pixel formula) →
    //      caption join from the container's .txt members → interleaved
    //      audio-text packing (128 audio tokens + caption tokens). One
    //      (stage, n_rows) hash gate; DuckDB replays every transition —
    //      closure, election, scene-cut count, pack walk — from source
    //      rows, so drift anywhere (a byte lost in the container, an
    //      envelope that stopped being scale-invariant, an election or
    //      bin seam flip) breaks the gate. Payloads never shuffle:
    //      envelopes, durations and token counts travel; pixels and
    //      samples stay scan-side. -----------------------------------
    Q("m19_av_chain",
      (s, dir) => {
        val mm = graft.llm.Multimodal
        val docsAll = t(s, dir, "documents").filter(col("doc_id") < 150)
        val ids = docsAll.select(col("doc_id").cast("long").as("id"),
          (col("doc_id") % 25).as("key"),
          when(col("doc_id") < 75, 1).otherwise(2).as("scale"))
        val wavs = mm.withSyntheticAudioScaled(ids, "id", "key", "scale",
          baseSamples = 1000, rate = 8000)
        val avis = mm.withSyntheticVideos(ids, "id", frames = 6)
        val tarIn = wavs.select(col("id"),
            format_string("av/%05d.wav", col("id")).as("name"),
            col("payload"))
          .unionByName(avis.select(col("id"),
            format_string("av/%05d.avi", col("id")).as("name"),
            col("payload")))
          .unionByName(docsAll.select(
            col("doc_id").cast("long").as("id"),
            format_string("av/%05d.txt", col("doc_id")).as("name"),
            encode(coalesce(col("text"), lit("")), "UTF-8").as("payload")))
        val tmp = Registry.scratchDir("m19_tar")
        graft.sources.TarIngest.writeTarDir(
          tarIn.repartition(4, col("id")).drop("id"), tmp, gzip = true)
        val (members, audit) = graft.sources.TarIngest.readTarDir(s, tmp)
        require(audit.filter(col("corrupt")).count() == 0,
          "m19: corrupt shards")
        // persisted (harness scope): the TAR re-streams per action and
        // six stages hang off the sample frame — one container decode
        val samples = CacheScope.harness.track(
          graft.sources.TarIngest.wdsSamples(members)).toDF()
        def byExt(e: String) = samples.filter(col("ext") === e)
          .select(regexp_extract(col("sample_key"), "(\\d+)$", 1)
            .cast("long").as("id"), col("payload"))
        val wavsIn = byExt("wav")
        val avisIn = byExt("avi")
        val caps = samples.filter(col("ext") === "txt")
          .select(regexp_extract(col("sample_key"), "(\\d+)$", 1)
            .cast("long").as("id"),
            decode(col("payload"), "UTF-8").as("caption"))
        // container round trip proven lossless on the audio bytes
        val restored = wavsIn
          .select(col("id"), md5(col("payload")).as("m1"))
          .join(wavs.select(col("id"), md5(col("payload")).as("m0")),
            "id")
          .filter(col("m1") === col("m0"))
        // ONE audio decode feeds dedup key, duration and the count
        val env = CacheScope.harness.track(
          mm.audioEnvelopes(wavsIn, "id", windows = 10)).toDF()
        val cc = graft.llm.Dedup.connectedComponents(
          env.select(col("id")),
          graft.llm.Dedup.starEdges(
            env.select(col("id"),
              md5(to_json(col("envelope"))).as("akey")), "akey", "id"))
        val canonical = graft.llm.Dedup.electCanonical(
          cc.join(env.select(col("id"), col("num_samples")), "id"),
          "rep", "id", "num_samples")
        // video features: the real AVI walk, m11's scene-cut rule
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("id").orderBy("frame_idx")
        val cuts = mm.decodeVideoFrames(avisIn, "id")
          .withColumn("prev", lag(col("sum_gray"), 1).over(w))
          .filter(col("prev").isNotNull &&
            abs(col("sum_gray") - col("prev")) > 300)
        val withCap = canonical
          .join(caps, canonical("canonical") === caps("id"))
        val counts = withCap.select(col("canonical").as("doc_id"),
          (lit(128L) + graft.llm.TextAnalysis.tokenCount(col("caption")))
            .as("n_tokens"))
        val packed = graft.llm.CorpusPipeline.packByCount(counts,
          capacity = 384, blockSize = 8)
        def stage(name: String, df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame =
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(name).as("stage"), col("n_rows"))
        stage("0_tar_members", samples)
          .union(samples.agg(countDistinct(col("sample_key"))
              .as("n_rows"))
            .select(lit("1_samples").as("stage"), col("n_rows")))
          .union(stage("2_wav_restored", restored))
          .union(stage("3_audio_envelopes", env))
          .union(stage("4_scene_cuts", cuts))
          .union(cc.agg(countDistinct(col("rep")).as("n_rows"))
            .select(lit("5_clusters").as("stage"), col("n_rows")))
          .union(canonical.agg(sum(col("canonical")).as("n_rows"))
            .select(lit("6_canonical_idsum").as("stage"), col("n_rows")))
          .union(stage("7_caption_join", withCap))
          .union(packed.agg(countDistinct(
              col("block") * 10000L + col("bin")).as("n_rows"))
            .select(lit("8_blocks").as("stage"), col("n_rows")))
          .union(counts.agg(sum(col("n_tokens")).as("n_rows"))
            .select(lit("9_tokens").as("stage"), col("n_rows")))
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
             |      ORDER BY 1000 * i.scale DESC, id) AS rk
             |  FROM cc JOIN ids i USING (id)),
             |canon AS (SELECT rep, id FROM rk WHERE rk = 1),
             |fr AS (
             |  SELECT d.doc_id, f.frame_idx,
             |    (SELECT CAST(sum((d.doc_id*31 + f.frame_idx*7 + i) % 256)
             |       AS BIGINT) FROM range(64) t(i)) AS sum_gray
             |  FROM documents d CROSS JOIN
             |    (SELECT unnest(generate_series(0, 5)) AS frame_idx) f
             |  WHERE d.doc_id < 150),
             |d2 AS (
             |  SELECT doc_id,
             |    abs(sum_gray - lag(sum_gray) OVER (PARTITION BY doc_id
             |      ORDER BY frame_idx)) AS delta
             |  FROM fr),
             |cnt AS (
             |  SELECT c.id AS doc_id,
             |    128 + CAST(len(list_filter(string_split_regex(
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
             |    CASE WHEN p.bt + n.nt <= 384 THEN p.bin ELSE p.bin + 1
             |      END,
             |    CASE WHEN p.bt + n.nt <= 384 THEN p.bt + n.nt ELSE n.nt
             |      END
             |  FROM pk_p p JOIN pk_n n
             |    ON n.block = p.block AND n.rn = p.rn + 1)
             |SELECT stage, n_rows FROM (
             |  SELECT '0_tar_members' AS stage,
             |    CAST(3 * count(*) AS BIGINT) AS n_rows FROM ids
             |  UNION ALL SELECT '1_samples', CAST(count(*) AS BIGINT)
             |    FROM ids
             |  UNION ALL SELECT '2_wav_restored', CAST(count(*) AS BIGINT)
             |    FROM ids
             |  UNION ALL SELECT '3_audio_envelopes',
             |    CAST(count(*) AS BIGINT) FROM ids
             |  UNION ALL SELECT '4_scene_cuts',
             |    (SELECT CAST(count(*) AS BIGINT) FROM d2
             |     WHERE delta IS NOT NULL AND delta > 300)
             |  UNION ALL SELECT '5_clusters',
             |    CAST(count(DISTINCT rep) AS BIGINT) FROM cc
             |  UNION ALL SELECT '6_canonical_idsum',
             |    (SELECT CAST(sum(id) AS BIGINT) FROM canon)
             |  UNION ALL SELECT '7_caption_join',
             |    CAST(count(*) AS BIGINT) FROM canon
             |  UNION ALL SELECT '8_blocks',
             |    CAST(count(DISTINCT block * 10000 + bin) AS BIGINT)
             |    FROM pk_p
             |  UNION ALL SELECT '9_tokens',
             |    CAST(sum(nt) AS BIGINT) FROM cnt)
             |ORDER BY stage""".stripMargin)),

    // ---- M20: the d35 valve contract ON THE REAL MEDIA DECODE PATH —
    //      m13's shape (WAV → RIFF decode → exact windowed-energy
    //      digest → distributed pair self-join) run with a PRODUCTION
    //      maxGroupSize: a planted degenerate envelope class (every
    //      10th doc byte-identical — 40 members, over the cap) drops
    //      WHOLE (conservative miss, never a partial cluster) while 97
    //      bounded content classes (≤5 members each) keep their exact
    //      ordered pair sets. Unlike d35 (scalar keys), content-key
    //      equality across congruent ids here RIDES THE DECODE — an
    //      envelope divergence between two byte-identical WAVs breaks
    //      the gate as surely as a wrong cap. This is the registry
    //      twin of the round-16 valve probe (BENCH_NOTES: at sf1 the
    //      uncapped hot key alone is C(5000,2) ≈ 12.5M pairs; capped,
    //      the quadratic term vanishes and bounded keys stay exact). --
    Q("m20_capped_media_pairs",
      (s, dir) => {
        val keyed = t(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id").cast("long").as("id"),
            when(col("doc_id") % 10 === 0, lit(0L))
              .otherwise(col("doc_id") % 97 + 1L).as("key"),
            lit(1).as("scale"))
        val wavs = graft.llm.Multimodal.withSyntheticAudioScaled(
          keyed, "id", "key", "scale", baseSamples = 200, rate = 8000)
        val env = graft.llm.Multimodal.audioWindowEnergy(wavs, "id",
          windows = 10)
        val feats = env.groupBy("id")
          .agg(md5(to_json(sort_array(
            collect_list(struct(col("win"), col("energy"))))))
            .as("content_key"))
        graft.llm.Dedup.pairsWithinGroups(feats, "content_key", "id",
            maxGroupSize = 8)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (
             |  SELECT doc_id AS id,
             |    CASE WHEN doc_id % 10 = 0 THEN 0
             |      ELSE doc_id % 97 + 1 END AS key
             |  FROM documents WHERE doc_id < 400),
             |sz AS (SELECT key, count(*) AS n FROM k GROUP BY key),
             |ok AS (SELECT k.id, k.key FROM k JOIN sz USING (key)
             |       WHERE sz.n <= 8)
             |SELECT a.id AS id_a, b.id AS id_b
             |FROM ok a JOIN ok b ON a.key = b.key AND a.id < b.id
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- L27: SHARD-DIRECTORY INTEGRITY AUDIT — the check a training
    //      loader runs before trusting mounted files: pack → write the
    //      byte-stable JSONL shards → PLANT a corruption (shard 3's
    //      first line dropped on disk — a truncated file in the wild) →
    //      read the files back (explicit schema, shard from the file
    //      name) → recompute every manifest statistic from the
    //      read-back rows and diff against the trusted manifest, plus
    //      the placement check (re-derive each row's shard from its
    //      (block, bin)). The tampered shard audits `corrupt` naming
    //      exactly the missing doc's token mass; the other six audit
    //      `ok` — so the gate proves BOTH directions at once: the sink→
    //      scan→recompute loop is lossless where untouched, and a
    //      single lost line is detected and localized. The oracle
    //      replays pack, assignment, the (block, bin, id) write order
    //      (to name the dropped line) and both stat sets from source
    //      rows. Scale: the audit costs one scan of the shard files +
    //      a skinny groupBy; corpus text never moves. ----------------
    Q("l27_manifest_audit",
      (s, dir) => {
        val sm = graft.llm.ShardManifest
        val packed = graft.llm.CorpusPipeline.packSequences(
          t(s, dir, "documents"), capacity = 120, blockSize = 256)
        val tmp = Registry.scratchDir("l27_shards")
        sm.writeShards(packed, tmp, nShards = 7)
        // planted corruption: truncate shard 3's first line (absent at
        // tiny SFs where shard 3 is empty — the oracle's exclusion
        // matches by construction)
        val p = new org.apache.hadoop.fs.Path(s"$tmp/shard-00003.jsonl")
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (fs.exists(p)) {
          val in = fs.open(p)
          val bytes =
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val b = new Array[Byte](65536)
              var n = in.read(b)
              while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
              buf.toByteArray
            } finally in.close()
          val nl = bytes.indexOf('\n'.toByte) + 1
          val out = fs.create(p, true)
          try out.write(bytes, nl, bytes.length - nl) finally out.close()
        }
        sm.auditShards(sm.readShards(s, tmp),
            sm.manifest(packed, nShards = 7), nShards = 7)
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
             |  SELECT doc_id, nt, block, bin, block * 10000 + bin AS bkey,
             |    ((((block * 10000 + bin) % 100000) * 2654435761)
             |      % 100000) % 7 AS shard
             |  FROM p),
             |h AS (
             |  SELECT shard, bkey, nt,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
             |      || ':' || CAST(nt AS VARCHAR)), 1, 12)) AS BIGINT)
             |      % 1000000007 AS hh,
             |    row_number() OVER (PARTITION BY shard
             |      ORDER BY block, bin, doc_id) AS wr
             |  FROM b),
             |e AS (
             |  SELECT shard, count(DISTINCT bkey) AS e_bins,
             |    count(*) AS e_docs, sum(nt) AS e_tokens,
             |    sum(hh) % 1000000007 AS e_ck
             |  FROM h GROUP BY shard),
             |f AS (
             |  SELECT shard, count(DISTINCT bkey) AS f_bins,
             |    count(*) AS f_docs, sum(nt) AS f_tokens,
             |    sum(hh) % 1000000007 AS f_ck
             |  FROM h WHERE NOT (shard = 3 AND wr = 1) GROUP BY shard)
             |SELECT e.shard,
             |  CAST(e_docs - coalesce(f_docs, 0) AS BIGINT)
             |    AS n_docs_missing,
             |  CAST(e_tokens - coalesce(f_tokens, 0) AS BIGINT)
             |    AS n_tokens_missing,
             |  CAST(e_bins - coalesce(f_bins, 0) AS BIGINT)
             |    AS n_bins_missing,
             |  coalesce(f_ck, -1) = e_ck AS checksum_match,
             |  CAST(0 AS BIGINT) AS n_misplaced,
             |  CASE WHEN e_docs = coalesce(f_docs, 0)
             |    AND e_tokens = coalesce(f_tokens, 0)
             |    AND e_bins = coalesce(f_bins, 0)
             |    AND coalesce(f_ck, -1) = e_ck
             |    THEN 'ok' ELSE 'corrupt' END AS status
             |FROM e LEFT JOIN f USING (shard)
             |ORDER BY shard""".stripMargin)),

    // ---- T36: FILTER CALIBRATION — the threshold sweep a production
    //      quality-filter deployment runs before picking its operating
    //      point: t34's trained classifier scores the held-out split,
    //      and every DISTINCT margin becomes a candidate threshold with
    //      its exact integer confusion counts (tp/fp/fn/tn at
    //      "keep iff margin ≥ thr"). The cumulatives ride the
    //      DISTRIBUTED runningTotal (range partition + broadcast
    //      offsets — never a single-task global window over the
    //      margin distribution, whose cardinality grows with the
    //      corpus); the oracle IS the window form (the u11/l25 gate
    //      shape), so the hash match proves the distributed cumsum
    //      identical to the sequential definition — through the whole
    //      replayed 10-iteration fit. --------------------------------
    Q("t36_filter_calibration",
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
        val sc = lr.margins(heldout, lr.fit(train, iters = 10, lrDen = 4L))
        lr.calibrationSweep(sc).orderBy("thr_micro")
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
           |${ctes.mkString(",\n")},
           |cal_m AS (
           |  SELECT score_micro AS thr_micro,
           |    CAST(sum(label) AS BIGINT) AS pos,
           |    CAST(sum(1 - label) AS BIGINT) AS neg
           |  FROM lr_out GROUP BY 1),
           |cal_c AS (
           |  SELECT thr_micro,
           |    sum(pos) OVER (ORDER BY thr_micro DESC
           |      ROWS UNBOUNDED PRECEDING) AS tp,
           |    sum(neg) OVER (ORDER BY thr_micro DESC
           |      ROWS UNBOUNDED PRECEDING) AS fp
           |  FROM cal_m),
           |cal_t AS (
           |  SELECT CAST(sum(pos) AS BIGINT) AS tpos,
           |    CAST(sum(neg) AS BIGINT) AS tneg FROM cal_m)
           |SELECT thr_micro, CAST(tp AS BIGINT) AS tp,
           |  CAST(fp AS BIGINT) AS fp,
           |  CAST(tpos - tp AS BIGINT) AS fn,
           |  CAST(tneg - fp AS BIGINT) AS tn
           |FROM cal_c, cal_t ORDER BY thr_micro""".stripMargin
      }),

    // ---- T37: OPERATING POINT — the choose-threshold step that closes
    //      the calibration loop (calibrate t36 → choose HERE → deploy
    //      t35/l26): the threshold maximizing F1 over the held-out
    //      sweep, in exact integer fixed-point (f1_micro = 2·tp·10⁶
    //      div (2·tp + fp + fn); denominator ≥ total positives > 0),
    //      ties to the SMALLER threshold (keep more). ONE argmax
    //      aggregate over the sweep (the a35 machinery) — never a
    //      global sort of the threshold distribution. The oracle
    //      replays fit → margins → window cumsum → fixed-point F1 →
    //      ORDER BY/LIMIT 1, so a one-micro drift in any confusion
    //      count flips the pick and breaks the hash. -----------------
    Q("t37_operating_point",
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
        val sc = lr.margins(heldout, lr.fit(train, iters = 10, lrDen = 4L))
        lr.operatingPoint(lr.calibrationSweep(sc))
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
           |${ctes.mkString(",\n")},
           |cal_m AS (
           |  SELECT score_micro AS thr_micro,
           |    CAST(sum(label) AS BIGINT) AS pos,
           |    CAST(sum(1 - label) AS BIGINT) AS neg
           |  FROM lr_out GROUP BY 1),
           |cal_c AS (
           |  SELECT thr_micro,
           |    CAST(sum(pos) OVER (ORDER BY thr_micro DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
           |    CAST(sum(neg) OVER (ORDER BY thr_micro DESC
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
           |  FROM cal_m),
           |cal_t AS (
           |  SELECT CAST(sum(pos) AS BIGINT) AS tpos,
           |    CAST(sum(neg) AS BIGINT) AS tneg FROM cal_m),
           |cal_f AS (
           |  SELECT thr_micro, tp, fp,
           |    tpos - tp AS fn, tneg - fp AS tn,
           |    (tp * 2000000) // (tp * 2 + (fp + (tpos - tp)))
           |      AS f1_micro
           |  FROM cal_c, cal_t)
           |SELECT thr_micro, f1_micro, tp, fp, fn, tn
           |FROM cal_f ORDER BY f1_micro DESC, thr_micro ASC
           |LIMIT 1""".stripMargin
      }),

    // ---- M21: MEDIA DECONTAMINATION — d10's eval-set anti-join on the
    //      PERCEPTUAL axis: benchmark images leak into web corpora
    //      re-encoded and re-scaled, so byte digests miss them; the
    //      dHash blocklist catches the leak across scales. Plant: m14's
    //      verified 25-key fixture — corpus doc_id < 150 (key mod 25,
    //      second half exact pixel-doubling), eval set doc_id ∈
    //      [315, 325) at scale 1 covering keys 15–24 — so a corpus
    //      image is contaminated iff its key ≥ 15, INCLUDING the
    //      scale-2 renditions whose bytes never appeared in the eval
    //      set (the cross-scale catch is the point). Every corpus doc
    //      comes back with its verdict, so the gate pins both the
    //      catches and the keeps; a decode/pooling divergence on
    //      either side of the join breaks it. Scale: eval blocklists
    //      are tiny by nature — the hash side broadcasts; the corpus
    //      decodes once, scan-side, and only (id, dhash) travels. ----
    Q("m21_media_decontaminate",
      (s, dir) => {
        val mm = graft.llm.Multimodal
        val corpus = t(s, dir, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id").cast("long").as("id"),
            (col("doc_id") % 25).as("key"),
            when(col("doc_id") < 75, 1).otherwise(2).as("scale"))
        val eval0 = t(s, dir, "documents")
          .filter(col("doc_id") >= 315 && col("doc_id") < 325)
          .select(col("doc_id").cast("long").as("id"),
            (col("doc_id") % 25).as("key"), lit(1).as("scale"))
        val corpusH = mm.dhashes(mm.withSyntheticImagesScaled(
            corpus, "id", "key", "scale", baseW = 36, baseH = 32), "id")
          .filter(col("dhash").isNotNull)
        val evalH = mm.dhashes(mm.withSyntheticImagesScaled(
            eval0, "id", "key", "scale", baseW = 36, baseH = 32), "id")
          .filter(col("dhash").isNotNull)
          .select(col("dhash")).distinct()
          .withColumn("__hit", lit(1))
        corpusH.join(broadcast(evalH), Seq("dhash"), "left")
          .select(col("id"),
            coalesce(col("__hit"), lit(0)).as("contaminated"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
             |  CAST(CASE WHEN doc_id % 25 >= 15 THEN 1 ELSE 0 END
             |    AS INT) AS contaminated
             |FROM documents WHERE doc_id < 150
             |ORDER BY id""".stripMargin)),

    // ---- N23: PERSISTED vector index — t35's fit-once/score-forever
    //      protocol on the ANN axis: a production vector index is
    //      trained once and mounted by every retrieval/dedup job, and
    //      a refit over a grown corpus yields DIFFERENT Forgy cells —
    //      a silently different index — so the artifact is the
    //      contract. Build the portable IVF centroids (first-10 Forgy
    //      over quantized vectors) → saveIvfIndex (≤10-row exact-
    //      BIGINT parquet) → loadIvfIndex → answer every query FROM
    //      THE LOADED ARTIFACT (3-probe, top-4 exact quantized-cosine
    //      rerank). The oracle replays the FULL build + query from
    //      source rows, so the hash match proves the parquet round
    //      trip lossless — one quantized centroid component off and a
    //      probe set shifts. Params differ from n13 (10 cells,
    //      3 probes, k=4) so the two gates pin different plans. ------
    Q("n23_ivf_persisted",
      (s, dir) => {
        val sim = graft.llm.Similarity
        val emb = tf(s, dir, "embeddings")
        val tmp = Registry.scratchDir("n23_ivf")
        sim.saveIvfIndex(sim.ivfCentroidsPortable(
          emb, "vec_id", "embedding", nCells = 10), s"$tmp/index")
        val cent = sim.loadIvfIndex(s, s"$tmp/index")
        sim.ivfTopKFromIndex(emb, "vec_id", "embedding", cent,
            queryMaxId = 15L, k = 4, nProbe = 3)
          .orderBy("query_id", "rank")
      },
      Some(graft.llm.Similarity.ivfTopKPortableOracleSql(
        "embeddings", "vec_id", "embedding", queryMaxId = 15L, k = 4,
        nCells = 10, nProbe = 3) + "")),

    // ---- L28: WATERFILLING token-budget allocation — the training-mix
    //      solve the l05/l13 family lacked: given per-source token
    //      masses and a total budget B (60% of the corpus here), give
    //      every source min(mass, L) tokens with ONE common level L
    //      chosen so allocations sum to exactly B — small sources keep
    //      everything, big sources are capped at the waterline (the
    //      proportional-fair mix every budgeted pretraining run
    //      computes; integer remainder goes one token each to the
    //      first sources past the cut in (mass, source) order, so the
    //      sum is EXACT). The cumulative mass rides the DISTRIBUTED
    //      runningTotal (source cardinality is domain cardinality at
    //      100 TB — never a one-task window); the oracle IS the window
    //      form (the u11/l25/t36 gate shape), replaying mass, prefix,
    //      cut row, level and remainder from source rows. ------------
    Q("l28_waterfill_budget",
      (s, dir) => {
        val tc = graft.llm.TextAnalysis.tokenCount(col("text"))
        val bySrc = t(s, dir, "documents").groupBy(col("source"))
          .agg(sum(tc).as("mass"))
        graft.llm.CorpusPipeline.waterfillBudget(bySrc, num = 3, den = 5)
          .orderBy("source")
      },
      Some("""WITH m AS (
             |  SELECT source, CAST(sum(len(list_filter(
             |    string_split_regex(trim(text), '\s+'),
             |    t -> strlen(t) > 0))) AS BIGINT) AS mass
             |  FROM documents GROUP BY 1),
             |w AS (
             |  SELECT source, mass,
             |    sum(mass) OVER (ORDER BY mass, source
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    CAST(row_number() OVER (ORDER BY mass, source)
             |      AS BIGINT) AS j
             |  FROM m),
             |b AS (SELECT CAST(sum(mass) AS BIGINT) AS t_mass,
             |        CAST(count(*) AS BIGINT) AS n_src FROM m),
             |lv AS (
             |  SELECT w.*, b.n_src,
             |    ((b.t_mass * 3) // 5) - (cum - mass) AS avail,
             |    b.n_src - j + 1 AS remaining
             |  FROM w, b),
             |fl AS (SELECT *, avail // remaining AS lvl FROM lv),
             |cut AS (SELECT min(j) AS cutj FROM fl WHERE mass >= lvl),
             |cl AS (SELECT f.lvl AS cut_lvl,
             |         f.avail % f.remaining AS cut_rem
             |       FROM fl f, cut WHERE f.j = cut.cutj)
             |SELECT source, mass,
             |  CAST(CASE WHEN j < cutj THEN mass
             |    ELSE cut_lvl + CASE WHEN j - cutj < cut_rem
             |      THEN 1 ELSE 0 END END AS BIGINT) AS alloc
             |FROM fl, cut, cl ORDER BY source""".stripMargin))
  )
}
