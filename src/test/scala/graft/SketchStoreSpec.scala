package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchStore

/** Mergeable-sketch laws: HLL rollup-of-parts equals sketch-of-whole
  * (the property that makes an incremental sketch store SOUND, not just
  * approximately useful), estimates are tight, and Count-Min errors are
  * one-sided and bounded.
  */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    (0 until 20000).map { i =>
      (s"g${i % 4}", s"d${i % 10}", rnd.nextInt(3000).toLong)
    }.toDF("grp", "day", "user")
  }

  test("HLL: union of per-(grp,day) sketches == direct per-grp sketch, exactly") {
    val fine = SketchStore.distinctSketches(df, Seq("grp", "day"), "user")
    val rolled = SketchStore.rollupDistinct(fine, Seq("grp"))
      .withColumnRenamed("approx_distinct", "merged")
    val direct = df.groupBy("grp")
      .agg(round(hll_sketch_estimate(hll_sketch_agg(col("user"), 12)))
        .cast("long").as("direct"))
    val rows = rolled.join(direct, "grp").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("merged") == r.getAs[Long]("direct"),
        s"register-max mergeability must be lossless: $r")
    }
  }

  test("HLL: global rollup estimate within 5% of exact NDV") {
    val fine = SketchStore.distinctSketches(df, Seq("grp", "day"), "user")
    val est = SketchStore.rollupDistinct(fine, Nil)
      .first().getAs[Long]("approx_distinct")
    val exact = df.select("user").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est=$est exact=$exact")
  }

  test("bitmap store: incremental fold equals from-scratch, and both are EXACT") {
    // Day-partitioned history: rolling up yesterday's bitmap table
    // unioned with today's delta table must equal both the rollup of the
    // from-scratch table AND the true COUNT(DISTINCT) — the exact-store
    // counterpart of the HLL register-max law.
    val yesterday = df.filter(col("day") =!= "d9")
    val today = df.filter(col("day") === "d9")
    val incremental = SketchStore.bitmapRollup(
      SketchStore.bitmapTable(yesterday, Seq("grp", "day"), "user")
        .unionByName(SketchStore.bitmapTable(today, Seq("grp", "day"), "user")),
      Seq("grp"))
    val scratch = SketchStore.bitmapRollup(
      SketchStore.bitmapTable(df, Seq("grp", "day"), "user"), Seq("grp"))
    val exact = df.groupBy("grp").agg(countDistinct("user").as("truth"))
    val rows = incremental.withColumnRenamed("distinct_items", "inc")
      .join(scratch.withColumnRenamed("distinct_items", "scr"), "grp")
      .join(exact, "grp").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("inc") == r.getAs[Long]("truth") &&
        r.getAs[Long]("scr") == r.getAs[Long]("truth"),
        s"bitmap store must be exact and incrementally foldable: $r")
    }
  }

  test("Count-Min: never undercounts, overshoot bounded by eps*N") {
    val n = df.count()
    val eps = 0.001
    val cm = SketchStore.cmBuild(df, "grp", eps = eps)
    val exact = df.groupBy(col("grp").cast("string").as("item"))
      .agg(count(lit(1)).as("exact_cnt"))
    val probed = SketchStore.cmProbe(exact.select("item"), "item", cm)
      .join(exact, "item").collect()
    assert(probed.length == 4)
    probed.foreach { r =>
      val est = r.getAs[Long]("est_cnt")
      val ex = r.getAs[Long]("exact_cnt")
      assert(est >= ex, s"Count-Min must never undercount: $r")
      assert(est - ex <= (eps * n).toLong + 1, s"overshoot above eps*N: $r")
    }
  }

  test("Count-Min probes are deterministic across rebuilds (fixed seed)") {
    val a = SketchStore.cmBuild(df, "user")
    val b = SketchStore.cmBuild(df.repartition(13), "user")
    val items = (0L until 100L).map(_.toString).toDF("item")
    val pa = SketchStore.cmProbe(items, "item", a).orderBy("item").collect()
    val pb = SketchStore.cmProbe(items, "item", b).orderBy("item").collect()
    assert(pa.sameElements(pb),
      "same seed + same data must give identical estimates at any partitioning")
  }
}
