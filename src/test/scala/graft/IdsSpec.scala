package graft

import org.apache.spark.sql.functions._

import graft.etl.Ids

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("denseIds: gap-free 1..n in the global total order") {
    val df = (0L until 500L).map(i => (i, s"k${i % 7}"))
      .toDF("id", "grp")
    val out = Ids.denseIds(df, Seq(col("grp"), col("id")))
      .collect().map(r => (r.getAs[Long]("row_id"),
        r.getAs[String]("grp"), r.getAs[Long]("id")))
    assert(out.map(_._1).sorted.toSeq == (1L to 500L).toSeq) // dense
    // ids agree with the order they claim to encode
    val bySort = out.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(bySort == (1L to 500L).toSeq, bySort.take(10).toString)
  }

  test("runningTotal: exact prefix sums in the global order, distributed") {
    val df = (0L until 400L).map(i => (399L - i, (i % 13) + 1))
      .toDF("k", "v")
    val out = Ids.runningTotal(df, Seq(col("k")), col("v"), "rt")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"),
        r.getAs[Long]("rt"))).sortBy(_._1)
    var acc = 0L
    out.foreach { case (_, v, rt) =>
      acc += v
      assert(rt == acc, s"running total diverged at $acc vs $rt")
    }
    // and no single-task window: the plan's Window is partitioned
    val plan = Ids.runningTotal(df, Seq(col("k")), col("v"), "rt")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Window
    plan.foreach {
      case w: Window => assert(w.partitionSpec.nonEmpty, w.simpleString(80))
      case _ => ()
    }
    spark.catalog.clearCache()
  }

  test("runningTotal survives fewer rows than shuffle partitions") {
    val out = Ids.runningTotal(Seq((3L, 30L), (1L, 10L), (2L, 20L))
        .toDF("k", "v"), Seq(col("k")), col("v"), "rt")
      .orderBy("k")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("rt")))
    assert(out.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
    spark.catalog.clearCache()
  }

  test("runningTotalByKey: per-key prefix sums ≡ the window form") {
    // skewed keys on purpose: one key holds ~80% of the rows — the
    // exact shape the grouped machinery exists for
    val df = (0L until 600L).map { i =>
      val k = if (i % 5 == 0) s"k${i % 3}" else "dominant"
      (i, k, (i % 7) + 1)
    }.toDF("id", "src", "v")
    val out = Ids.runningTotalByKey(df, Seq("src"), Seq(col("id")),
        col("v"), "rt")
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("id"),
        r.getAs[Long]("v"), r.getAs[Long]("rt")))
    // reference: plain per-key scan in id order
    out.groupBy(_._1).foreach { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._2).foreach { case (_, _, v, rt) =>
        acc += v
        assert(rt == acc, s"per-key running total diverged: $rt vs $acc")
      }
    }
    assert(out.length == 600)
    spark.catalog.clearCache()
  }

  test("runningTotalByKey: partition-count invariance") {
    val df = (0L until 300L).map(i => (i, s"g${i % 2}", 1L))
      .toDF("id", "g", "v")
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Ids.runningTotalByKey(df, Seq("g"), Seq(col("id")), col("v"), "rt")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("g"),
          r.getAs[Long]("rt")))
        .sortBy(_._1).toSeq
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.catalog.clearCache()
      }
    }
    assert(run("3") == run("17"))
  }

  test("runningTotalByKey: no per-key window — every window group is " +
    "(partition, key), the plan range-partitions") {
    val df = (0L until 200L).map(i => (i, "onlykey", 1L))
      .toDF("id", "g", "v")
    // partition counts are size-adaptive now (Ids.adaptiveParts); pin a
    // tiny advisory size so this toy frame plans the at-scale multi-
    // partition shape the lint is about
    val prev = spark.conf.getOption(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1b")
    val out =
      try Ids.runningTotalByKey(df, Seq("g"), Seq(col("id")), col("v"), "rt")
      finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(600))
    import org.apache.spark.sql.catalyst.plans.logical.Window
    out.queryExecution.optimizedPlan.foreach {
      case w: Window =>
        val ps = w.partitionSpec.map(_.toString).mkString(",")
        assert(ps.contains("__part"),
          s"window must partition by __part, not the key alone: $ps")
      case _ => ()
    }
    out.collect()
    spark.catalog.clearCache()
  }

  test("denseIdsByKey: gap-free 1..n per key under skew") {
    val df = (0L until 400L).map { i =>
      (i, if (i % 4 == 0) s"k${i % 2}" else "dominant")
    }.toDF("id", "grp")
    val out = Ids.denseIdsByKey(df, Seq("grp"), Seq(col("id")))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"),
        r.getAs[Long]("row_id")))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byOrder = rows.sortBy(_._2).map(_._3).toSeq
      assert(byOrder == (1L to rows.length).toSeq,
        byOrder.take(5).toString)
    }
    spark.catalog.clearCache()
  }

  test("runningTotalByKey fails LOUDLY on null keys (the offsets join " +
      "would silently drop them)") {
    val df = Seq((1L, Some("a"), 1L), (2L, None, 1L), (3L, Some("a"), 1L))
      .toDF("id", "g", "v")
    val e = intercept[IllegalArgumentException] {
      Ids.runningTotalByKey(df, Seq("g"), Seq(col("id")), col("v"), "rt")
    }
    assert(e.getMessage.contains("null"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("runningTotalByKey fails fast past maxOffsetRows instead of " +
      "flooding the driver") {
    // 300 distinct keys x partitions >> maxOffsetRows=64: a misuse with
    // a high-cardinality key must point the caller at the plain window
    val df = (0L until 300L).map(i => (i, s"k$i", 1L)).toDF("id", "g", "v")
    val e = intercept[IllegalArgumentException] {
      Ids.runningTotalByKey(df, Seq("g"), Seq(col("id")), col("v"), "rt",
        maxOffsetRows = 64)
    }
    assert(e.getMessage.contains("window"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("denseIds survives fewer rows than shuffle partitions") {
    val out = Ids.denseIds(Seq((3L, "c"), (1L, "a"), (2L, "b"))
        .toDF("id", "k"), Seq(col("id")))
      .orderBy("row_id")
      .collect().map(r => (r.getAs[Long]("row_id"), r.getAs[Long]("id")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
