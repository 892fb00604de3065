package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) query set against the
  *    corpus — a broadcast nested-loop that scans the corpus ONCE however
  *    large it is; correct baseline and the oracle for recall tests.
  *  - LSH-bucketed (random hyperplanes): corpus is bucketed by sign
  *    pattern scan-side, queries probe their bucket via an equi-join —
  *    the 100 TB path (no corpus × query product).
  *
  * Dot products run in double via `zip_with` + `aggregate` (a sequential
  * left fold — deterministic summation order, so results are reproducible
  * across partitionings and match a row-at-a-time oracle bit-for-bit).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector (broadcast nested loop +
    * per-query rank window). Deterministic: ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Deterministic random hyperplanes (fixed seed): `nPlanes` × `dim`. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id for a vector column. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = typedLit(p.toSeq)
      val d = aggregate(zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: bucket corpus and queries with the same planes,
    * equi-join on the bucket id, rank within. Recall is tuned by
    * `nPlanes` (fewer planes → bigger buckets) and multi-probe: each
    * query also probes every bucket at Hamming distance 1 (flip one
    * plane bit), the standard recall boost that costs only nPlanes extra
    * probe rows per QUERY — corpus cost is unchanged. The join is a
    * plain shuffled/broadcast equi-join on a long key — never a
    * cartesian product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nPlanes: Int = 8, dim: Int = 64,
              multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val probes =
      if (multiProbe)
        explode(array(col("bucket0") +: (0 until nPlanes).map(i =>
          col("bucket0").bitwiseXOR(lit(1L << i))): _*))
      else col("bucket0")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))
      .withColumn("bucket0", lshBucket(col("qv"), planes))
      .withColumn("bucket", probes)
      .drop("bucket0"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** IVF-style ANN — the other classic scale path: corpus vectors are
    * assigned to their nearest of K fixed centroids (one scan-side pass,
    * bucketed by centroid id); queries probe their `nProbe` nearest
    * centroids and rank only within those cells. Centroids here are a
    * deterministic sample of the corpus (ids 0..K-1) — in production a
    * k-means fit; the engine-side plumbing (assignment, cell join,
    * in-cell rank) is identical.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val centroids: Array[(Int, Array[Double])] =
      corpus.orderBy(col(idCol)).limit(nCells)
        .select(col(vecCol)).collect()
        .zipWithIndex.map { case (r, i) =>
          i -> r.getSeq[Float](0).map(_.toDouble).toArray
        }

    def dist2(vec: Column, c: Array[Double]): Column =
      aggregate(zip_with(vec, typedLit(c.toSeq),
        (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
        lit(0.0), (acc, v) => acc + v)

    /** struct(dist, cell) per centroid; array_sort ranks cells by dist. */
    def cellsRanked(vec: Column): Column =
      array_sort(array(centroids.toIndexedSeq.map { case (i, c) =>
        struct(dist2(vec, c).as("d"), lit(i).as("cell"))
      }: _*))

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", element_at(cellsRanked(col("cv")), 1)
        .getField("cell"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))
      .withColumn("cell", explode(slice(
        transform(cellsRanked(col("qv")), s => s.getField("cell")),
        1, nProbe))))
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: within-bucket
    * pairs above a cosine threshold. Same banding logic as Dedup — no
    * all-pairs product.
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, nPlanes: Int = 12,
                     dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, nPlanes)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val a = v.as("a"); val b = v.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
