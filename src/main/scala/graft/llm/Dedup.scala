package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design: every near-dup path is banded-LSH — signatures are
  * computed scan-side (no shuffle), candidates come from a `groupBy`-
  * style equi-join on (band, bandHash) bucket keys, and only within-
  * bucket pairs are verified. There is NO all-pairs `crossJoin` anywhere:
  * cost is O(N · bands) shuffle + O(candidate pairs) verify, which
  * survives a 100×/1000× scale-up where N² does not.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: hash-groupBy on a content digest. One shuffle on the
    * digest (not the document text — keys are 32 bytes regardless of doc
    * size).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  def exactDupStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_docs"),
      countDistinct(md5(col(textCol))).as("distinct_docs"),
      (count(lit(1)) - countDistinct(md5(col(textCol)))).as("exact_dups"))

  // -------------------------------------------------------------- minhash

  /** Character k-shingles (distinct). Empty-safe for docs shorter than k. */
  def shingles(text: Column, k: Int = 5): Column =
    when(length(text) >= k,
      array_distinct(transform(sequence(lit(0), length(text) - k),
        i => substr(text, i + 1, lit(k)))))
      .otherwise(array(text))

  /** MinHash signature: `numHashes` independent permutations approximated
    * by seeded xxhash64; each signature row is `min` over the shingle set
    * — computed per row with zero shuffle.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(seed))))): _*)

  /** LSH band keys: split the signature into `bands` bands of
    * `numHashes/bands` rows; hash each band. Docs sharing ANY band hash
    * become candidates (classic banding: P[candidate] = 1-(1-j^r)^b).
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))): _*)

  /** Near-duplicate candidate pairs via banded MinHash LSH, verified with
    * exact Jaccard over the shingle sets. Returns (id_a, id_b, jaccard)
    * with id_a < id_b, jaccard >= threshold.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 5, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = df.select(col(idCol).as("id"),
        shingles(col(textCol), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("bands", bandHashes(col("sig"), bands, rowsPerBand))

    // Explode to (bucket key → id); the join below is a plain shuffled
    // equi-join on small keys — never an all-pairs product.
    val buckets = withSig.select(col("id"), explode(col("bands")).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))

    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val sh = withSig.select(col("id"), col("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"),
        "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
        "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash per document: per-token hash bit votes summed in ONE
    * groupBy over exploded tokens (64 aggregate columns, single shuffle),
    * then folded into a long.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val agg = toks.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    agg.select(col("id"), sim.as("simhash"))
  }

  /** N-gram (word n-gram) Jaccard similarity between two text columns —
    * the verify kernel used on candidate pairs.
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    def grams(t: Column): Column = {
      val toks = TextAnalysis.tokens(lower(t))
      when(size(toks) >= n,
        array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val ga = grams(a); val gb = grams(b)
    size(array_intersect(ga, gb)).cast("double") /
      greatest(size(array_union(ga, gb)), lit(1))
  }
}
