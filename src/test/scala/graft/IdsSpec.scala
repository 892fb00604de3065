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

  test("denseIds survives fewer rows than shuffle partitions") {
    val out = Ids.denseIds(Seq((3L, "c"), (1L, "a"), (2L, "b"))
        .toDF("id", "k"), Seq(col("id")))
      .orderBy("row_id")
      .collect().map(r => (r.getAs[Long]("row_id"), r.getAs[Long]("id")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
