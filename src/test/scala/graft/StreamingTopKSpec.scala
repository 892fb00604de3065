package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Incremental streaming top-k per key (streaming/StreamingTopK):
  * last-write-wins replacement, bounded list state, statestore audit.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("leaderboard folds batches: replace scores, keep only k in state") {
    val dir = Files.createTempDirectory("graft-stk").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val cp = s"$dir/cp"
    val schema = Seq((0L, 0L, 0L)).toDF("key", "item", "score").schema
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    graft.streaming.RunningSpend.requiredConfs(spark)
    try {
      def drain(): Unit = {
        val q = graft.streaming.StreamingTopK.leaderboard(
            spark.readStream.schema(schema).parquet(in), k = 3)
          .writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              graft.streaming.StreamingTopK.Ranked], bid: Long) =>
            batch.withColumn("batch_id", lit(bid))
              .write.mode("append").parquet(out); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.drain()
      }
      Seq((1L, 101L, 5L), (1L, 102L, 9L), (1L, 103L, 7L), (1L, 104L, 1L),
        (2L, 201L, 3L))
        .toDF("key", "item", "score").coalesce(1)
        .write.mode("append").parquet(in)
      drain() // key 1 top-3: 102(9), 103(7), 101(5); 104 pruned from state
      // 104 re-observed with a big score re-enters; 102's score drops so
      // it leaves the board (last-write-wins, not double-count)
      Seq((1L, 104L, 20L), (1L, 102L, 2L))
        .toDF("key", "item", "score").coalesce(1)
        .write.mode("append").parquet(in)
      drain()
      val rows = spark.read.parquet(out)
      val lastBatch = rows.agg(max("batch_id")).as[Long].collect().head
      val board = rows.filter(col("batch_id") === lastBatch &&
          col("key") === 1L)
        .select("rank", "item", "score")
        .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
      assert(board == Seq((1, 104L, 20L), (2, 103L, 7L), (3, 101L, 5L)),
        s"board: $board")

      // offline audit: the list state holds EXACTLY k entries for key 1
      val state = spark.read.format("statestore")
        .option("path", cp)
        .option("stateVarName", "topk")
        .option("flattenCollectionTypes", "true")
        .load()
        .select(col("key.value").as("k"),
          col("list_element._1").as("item"))
        .as[(Long, Long)].collect()
      assert(state.count(_._1 == 1L) == 3, state.mkString(","))
      assert(state.filter(_._1 == 1L).map(_._2).toSet ==
        Set(101L, 103L, 104L), state.mkString(","))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
