package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Partitioned-lake layout: round trip, dynamic partition overwrite, and
  * the planning-time partition-pruning proof (the 100 TB property).
  */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, "2024-01-05", 10.0), (2L, "2024-01-20", 20.0),
    (3L, "2024-02-03", 30.0), (4L, "2024-03-11", 40.0)
  ).toDF("id", "date", "v").withColumn("date", col("date").cast("date"))

  test("partitioned write round-trips and lays out month directories") {
    val dir = Files.createTempDirectory("graft-lake").toString
    Lake.writePartitioned(Lake.withMonth(fact, "date"), dir, Seq("month"))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("month=2024-01", "month=2024-02", "month=2024-03"))
    val back = Lake.read(spark, dir)
    assert(back.count() == 4)
    assert(back.select(sum("v")).head.getDouble(0) == 100.0)
  }

  test("partition filter prunes directories at planning time") {
    val dir = Files.createTempDirectory("graft-lake").toString
    Lake.writePartitioned(Lake.withMonth(fact, "date"), dir, Seq("month"))
    val pruned = Lake.read(spark, dir).filter(col("month") === "2024-01")
    // the predicate must land in PartitionFilters (planning-time), not in
    // the post-scan Filter (runtime)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("month"), s"month predicate not pushed to partitions:\n$scan")
    // and only the pruned partition's files are actually read: the scan's
    // numFiles metric after execution vs the parquet files on disk
    assert(pruned.count() == 2)
    val read = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numFiles").value
    val onDisk = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var total = 0
    while (onDisk.hasNext)
      if (onDisk.next().toString.endsWith(".parquet")) total += 1
    assert(read < total, s"scan read $read of $total files — no pruning")
  }

  test("dynamic partition pruning fires on a dim-filtered fact join") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    Lake.writePartitioned(Lake.withMonth(fact, "date"), dir, Seq("month"))
    // equality-on-literal filter: the shape DPP's isLikelySelective
    // check recognizes (a bare boolean attribute does not qualify). The
    // dim must be a real table — a local Seq gets its filter folded into
    // the LocalRelation before the pruning rule can see it.
    Seq(("2024-01", "live"), ("2024-02", "old"), ("2024-03", "old"))
      .toDF("month", "tag").write.parquet(s"$dir-dim")
    val dim = spark.read.parquet(s"$dir-dim")
    // KB-sized test tables fail DPP's size-based benefit heuristic; this
    // test pins the MECHANISM (runtime subquery on the partition column),
    // so bypass the cost model, not the feature
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "50")
    try {
      val joined = Lake.read(spark, dir)
        .join(dim.filter(col("tag") === "live"), Seq("month"))
      // the fact side's partition filter must be a runtime subquery fed
      // by the dim filter — Catalyst's dynamic partition pruning
      val plan = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery in plan:\n$plan")
      assert(joined.count() == 2) // only January rows survive
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("compaction rewrites many small files into few, same data") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    // 20 single-row writes → 20 tiny files
    (1 to 20).foreach { i =>
      Seq((i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(src)
    }
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 20)
    Lake.compactTo(spark, src, dst, targetBytes = 1024L * 1024 * 1024)
    assert(parquetFiles(dst) == 1, "1 GiB target must yield a single file")
    val back = Lake.read(spark, dst)
    assert(back.count() == 20)
    assert(back.select(sum("v")).head.getDouble(0) == 210.0)
  }

  test("partitioned compaction splits hot partitions, keeps cold ones whole") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    // hot partition: 5000 rows over 10 small appends; cold: a single row
    (0 until 10).foreach { i =>
      spark.range(i * 500, (i + 1) * 500)
        .select(col("id"), lit("hot").as("k"),
          concat(lit("payload-"), col("id")).as("v"))
        .coalesce(1).write.mode("append").parquet(src)
    }
    Seq((-1L, "cold", "tiny")).toDF("id", "k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    // k= is a plain column here; rewrite it as the partition layout
    val part = s"$dir/part"
    Lake.writePartitioned(spark.read.parquet(src), part, Seq("k"))
    def bytesUnder(d: String): Long =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length).sum
    def filesUnder(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    val hotBytes = bytesUnder(s"$part/k=hot")
    // target ~1/6 of the hot partition: the old repartition-on-partition-
    // cols-only path produced exactly ONE file here regardless of target
    Lake.compactTo(spark, part, dst, targetBytes = math.max(1L, hotBytes / 6),
      partitionCols = Seq("k"))
    val hotFiles = filesUnder(s"$dst/k=hot")
    val coldFiles = filesUnder(s"$dst/k=cold")
    assert(hotFiles >= 3 && hotFiles <= 6,
      s"hot partition should split into ~6 files, got $hotFiles")
    assert(coldFiles == 1, s"cold partition should stay whole, got $coldFiles")
    val back = Lake.read(spark, dst)
    assert(back.count() == 5001)
    assert(back.filter(col("k") === "cold").count() == 1)
    assert(back.select(sum("id")).head.getLong(0) ==
      (0L until 5000L).sum - 1)
  }

  test("clustered write yields disjoint per-file ranges (data skipping)") {
    val dir = Files.createTempDirectory("graft-cluster").toString
    val src = spark.read.parquet(s"$sf/orders.parquet")
    Lake.writeClustered(src, s"$dir/clustered", Seq("o_totalprice"), 6)
    val files = new java.io.File(s"$dir/clustered").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4, s"expected ~6 range files, got ${files.length}")
    // the skipping property, proven from the data: each file's
    // [min,max] of the cluster key must not overlap any other's —
    // parquet footer stats derive from exactly these values, so a
    // predicate on o_totalprice prunes to one file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_totalprice"), max("o_totalprice")).head
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(s"$dir/clustered").count() == src.count())
  }

  test("bloom-filtered write: point probe on an interleaved key skips " +
      "row groups the plain layout must decode") {
    val dir = Files.createTempDirectory("graft-lake-bloom").toString
    // high-cardinality key, deliberately INTERLEAVED across files so
    // every row group's [min,max] covers any probe — min/max stats
    // can't skip anything; only the bloom can
    val rows = spark.range(0, 50000)
      .select(md5(concat(lit("k"), col("id"))).as("key"),
        col("id").as("v"))
    val probe = "k31337" // a key that exists, planted mid-range
    val probeKey = org.apache.commons.codec.digest.DigestUtils.md5Hex(probe)
    // plain layout: same file count, same per-column dictionary setting,
    // NO bloom — the delta below is attributable to the bloom alone
    rows.repartition(8).write
      .option("parquet.enable.dictionary#key", "false")
      .mode("overwrite").parquet(s"$dir/plain")
    Lake.writeBloomFiltered(rows, s"$dir/bloom", Seq("key"),
      expectedNdv = 50000L, nFiles = 8)
    def decodedRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("key") === probeKey)
      assert(q.count() == 1)             // probe actually hits
      val df = spark.read.parquet(path).filter(col("key") === probeKey)
      df.collect()
      // the SCAN's output rows = rows decoded from surviving row groups
      // (vectorized reader filters at row-group granularity; the
      // residual Filter node above the scan drops the rest)
      val scans = df.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val plain = decodedRows(s"$dir/plain")
    val bloom = decodedRows(s"$dir/bloom")
    // plain decodes every row group (interleaved key defeats min/max);
    // bloom decodes only the group holding the key (+ false positives)
    assert(plain == 50000L, s"plain layout should decode all: $plain")
    assert(bloom < plain / 2,
      s"bloom should skip most row groups: bloom=$bloom plain=$plain")
  }

  test("dynamic overwrite replaces only the partitions present") {
    val dir = Files.createTempDirectory("graft-lake").toString
    Lake.writePartitioned(Lake.withMonth(fact, "date"), dir, Seq("month"))
    // rewrite ONLY January with corrected values
    val fix = Seq((9L, "2024-01-09", 99.0)).toDF("id", "date", "v")
      .withColumn("date", col("date").cast("date"))
    Lake.writePartitioned(Lake.withMonth(fix, "date"), dir, Seq("month"))
    val back = Lake.read(spark, dir)
    assert(back.count() == 3) // 1 new Jan row + Feb + Mar untouched
    assert(back.filter(col("month") === "2024-02").count() == 1)
  }

  test("readMerged reconciles files written under evolved schemas") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 writer: (id, v) — the file predates the quality column
    Seq((1L, 10.0)).toDF("id", "v").write.parquet(s"$dir/f1")
    // v2 writer: (id, v, quality)
    Seq((2L, 20.0, 0.9)).toDF("id", "v", "quality")
      .write.parquet(s"$dir/f2")
    val merged = Lake.readMerged(spark, s"$dir/f*")
    assert(merged.columns.toSet == Set("id", "v", "quality"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality"))) // v1 → null
    assert(rows(1).getDouble(rows(1).fieldIndex("quality")) == 0.9)
    // the plain read would have bound to ONE footer's schema — pin that
    // readMerged is what makes evolution safe, not the default path
    assert(spark.read.parquet(s"$dir/f*").columns.length <= 3)
  }
}
