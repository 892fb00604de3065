package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.llm.Dedup

/** Streaming incremental NEAR-dup detection — the streaming member of
  * the incremental-dedup family: exact streaming dedup is
  * `dropDuplicatesWithinWatermark` ([[EventStream]]); the batch
  * incremental near-dup is `Dedup.incrementalNearDups` (new×prior and
  * new×new candidates only, never prior×prior). This is the same
  * contract kept ALIVE across micro-batches with `transformWithState`:
  *
  *   - upstream (stateless, scan-side): doc → MinHash signature →
  *     banded LSH bucket rows, the exact `Dedup.lshBuckets` pipeline
  *     (same seeds, same band hashing), so a doc's streaming buckets
  *     are bit-identical to its batch buckets;
  *   - state: keyed by LSH bucket (band, band-hash packed into one
  *     long), a `MapState[docId → signature]` of the docs previously
  *     filed in that bucket, capped at `maxPerBucket` entries (a
  *     saturated bucket is a degenerate near-everything cluster — new
  *     members still PROBE it but stop enlarging it, so state per
  *     bucket is bounded no matter how pathological the corpus);
  *   - per batch: each new doc probes ONLY the buckets it lands in
  *     (point get of touched keys — untouched buckets are never read),
  *     emits new×prior and new×new candidate pairs whose signature
  *     agreement clears `minAgree`, then files itself into the bucket.
  *     Prior×prior pairs are structurally impossible: both endpoints of
  *     every emitted pair include a doc from the current batch.
  *
  * Pair verification is SIGNATURE agreement (fraction of equal MinHash
  * components — the standard unbiased Jaccard estimator), not exact
  * shingle Jaccard: streaming state holds 32 longs per doc, never text,
  * so a bucket's RocksDB footprint is ~300 bytes/doc and the exact-text
  * re-check stays a downstream batch join against the corpus (the
  * `incrementalNearDups` verify step) for the pairs that matter.
  *
  * A pair sharing several bands is emitted once per shared bucket
  * (per-bucket emission is what keeps the processor scan-free);
  * downstream dedups with `dropDuplicates("id_a", "id_b")` per sink
  * batch, mirroring the batch path's `.distinct()` on candidates.
  *
  * Scale shape: state is O(buckets · min(bucketSize, maxPerBucket))
  * signatures in the RocksDB map column family; per-batch work is
  * O(batch docs · bands · bucket occupancy) — no rescan of history, no
  * state scan, exactly the steady-state cost profile of the batch
  * incremental path.
  */
object StreamingNearDup {

  case class BucketDoc(bucket: Long, id: Long, sig: Array[Long])
  case class CandPair(bucket: Long, id_a: Long, id_b: Long, vs: String,
                      est_jaccard: Double)

  /** Stateless scan-side prep shared by stream and spec: doc →
    * exploded (bucket, id, sig) rows. Bucket key packs (band, bh) into
    * one long — band in the top 8 bits — so the state key is a single
    * fixed-width column.
    */
  def bucketRows(docs: DataFrame, textCol: String, idCol: String,
                 k: Int = 3, numHashes: Int = 32,
                 bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    docs.select(col(idCol).cast("long").as("id"),
        graft.plans.MinHashSig(col(textCol), k, numHashes).as("sig"))
      .withColumn("bands",
        Dedup.bandHashes(col("sig"), bands, rowsPerBand))
      .select(col("id"), col("sig"), explode(col("bands")).as("bk"))
      .select(
        (shiftleft(col("bk.band").cast("long"), 56) +
          col("bk.bh").bitwiseAND(lit((1L << 56) - 1))).as("bucket"),
        col("id"), col("sig"))
  }

  /** Signatures live in state as packed BYTES (8 per component,
    * big-endian) — a fixed-width binary value the `statestore` reader
    * audits directly, with no codegen/serializer dependency in the
    * RocksDB column family.
    */
  private[streaming] def pack(sig: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(sig.length * 8)
    sig.foreach(bb.putLong)
    bb.array()
  }
  private[streaming] def unpack(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  class Processor(minAgree: Double, maxPerBucket: Int, numHashes: Int)
      extends StatefulProcessor[Long, BucketDoc, CandPair] {
    @transient private var filed: MapState[Long, Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      filed = getHandle.getMapState[Long, Array[Byte]]("filed",
        Encoders.scalaLong, Encoders.BINARY, TTLConfig.NONE)

    private def agree(a: Array[Long], b: Array[Long]): Double = {
      var i = 0; var eq = 0
      while (i < numHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / numHashes
    }

    override def handleInputRows(key: Long, rows: Iterator[BucketDoc],
                                 timers: TimerValues): Iterator[CandPair] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      // prior occupants of THIS bucket only (bounded by maxPerBucket);
      // a doc re-filed with the same id probes but is not its own dup
      val prior = filed.iterator()
        .map { case (pid, psig) => pid -> unpack(psig) }.toArray
      var nFiled = prior.length
      val batchSeen =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
      rows.foreach { d =>
        prior.foreach { case (pid, psig) =>
          if (pid != d.id) {
            val a = agree(d.sig, psig)
            if (a >= minAgree)
              out += CandPair(key, d.id, pid, "prior", a)
          }
        }
        batchSeen.foreach { case (bid, bsig) =>
          if (bid != d.id) {
            val a = agree(d.sig, bsig)
            if (a >= minAgree)
              out += CandPair(key, math.min(d.id, bid),
                math.max(d.id, bid), "batch", a)
          }
        }
        batchSeen += d.id -> d.sig
        if (nFiled < maxPerBucket && !filed.containsKey(d.id)) {
          filed.updateValue(d.id, pack(d.sig))
          nFiled += 1
        }
      }
      out.iterator
    }
  }

  /** Wire over a streaming (id, text) frame; emits candidate near-dup
    * pairs per micro-batch. Requires the RocksDB provider
    * ([[RunningSpend.requiredConfs]]).
    */
  def nearDups(docs: DataFrame, textCol: String, idCol: String,
               k: Int = 3, numHashes: Int = 32, bands: Int = 8,
               minAgree: Double = 0.7,
               maxPerBucket: Int = 1024): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bucketRows(docs, textCol, idCol, k, numHashes, bands)
      .as[BucketDoc]
      .groupByKey(_.bucket)
      .transformWithState(new Processor(minAgree, maxPerBucket, numHashes),
        TimeMode.None(), OutputMode.Append(), Encoders.product[CandPair])
  }

  /** EXACT verification of [[nearDups]]' signature-agreement candidates
    * — the documented downstream batch step, mirroring
    * `Dedup.incrementalNearDups`' verify stage: per sink micro-batch,
    * the per-bucket emissions dedup to unique pairs, BOTH endpoints
    * fetch their text from the corpus (point equi-joins sized by the
    * CANDIDATES, never a corpus rescan — streaming state holds 32 longs
    * per doc, never text, so text lives only here), and a pair survives
    * iff its exact k-shingle Jaccard clears `threshold`. Signature
    * agreement is an unbiased Jaccard ESTIMATE — collisions and lucky
    * component agreement pass the streaming stage; this is the stage
    * that kills them.
    *
    * Returns (id_a, id_b, vs, est_jaccard, jaccard) for surviving pairs.
    */
  def verifyCandidates(cands: DataFrame, corpus: DataFrame,
                       textCol: String, idCol: String, k: Int = 3,
                       threshold: Double = 0.7): DataFrame = {
    val uniq = cands
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("vs")).as("vs"),
        max(col("est_jaccard")).as("est_jaccard"))
    val txt = corpus.select(col(idCol).cast("long").as("__tid"),
      col(textCol).as("__txt"))
    def sh(c: org.apache.spark.sql.Column) = Dedup.wordShingles(c, k)
    uniq
      .join(txt.select(col("__tid").as("id_a"), col("__txt").as("__ta")),
        Seq("id_a"))
      .join(txt.select(col("__tid").as("id_b"), col("__txt").as("__tb")),
        Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(sh(col("__ta")), sh(col("__tb"))))
          .cast("double") /
          size(array_union(sh(col("__ta")), sh(col("__tb")))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("vs"), col("est_jaccard"),
        col("jaccard"))
  }

  /** `foreachBatch` body composing [[nearDups]] with [[verifyCandidates]]
    * end-to-end: candidates stream out of state, this verifies each sink
    * micro-batch exactly and hands the survivors (plus the micro-batch
    * id) to `sink`. `corpus` is a THUNK re-evaluated per batch so a
    * batch view over the same growing input (e.g. the stream's source
    * directory read as a batch frame) sees documents landed since the
    * query started — a candidate's prior endpoint is never in the
    * current micro-batch.
    */
  def verifiedForeachBatch(corpus: () => DataFrame, textCol: String,
                           idCol: String, k: Int = 3,
                           threshold: Double = 0.7)
                          (sink: (DataFrame, Long) => Unit)
      : (Dataset[CandPair], Long) => Unit =
    (batch, bid) =>
      sink(verifyCandidates(batch.toDF(), corpus(), textCol, idCol, k,
        threshold), bid)
}
