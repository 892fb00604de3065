package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Structured-Streaming form of the daily incremental loop (SURVEY §2.9):
  * same windowedCounts logic runs batch and streaming.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventsDf = Seq(
    ("2024-01-01 01:00:00", "click", 1.0),
    ("2024-01-01 02:00:00", "click", 2.0),
    ("2024-01-01 03:00:00", "view", 5.0),
    ("2024-01-02 01:00:00", "click", 4.0)
  ).toDF("ts", "event_type", "value")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("batch windowedCounts: daily tumbling windows, exact sums") {
    val out = EventStream.windowedCounts(eventsDf)
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("events") == 2)
    assert(out(0).getAs[Double]("total_value") == 3.0)
    assert(out(2).getAs[Long]("events") == 1)
    assert(out(2).getAs[Double]("total_value") == 4.0)
  }

  test("same logic runs as a file-source stream (AvailableNow)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    eventsDf.write.parquet(s"$dir/in")
    val stream = EventStream.readEvents(spark, s"$dir/in",
      schema = eventsDf.schema)
    assert(stream.isStreaming)
    val q = EventStream.windowedCounts(stream).writeStream
      .format("memory").queryName("wc")
      .outputMode("complete") // memory+complete: watermark not needed to close
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT * FROM wc ORDER BY window_start, event_type")
      .collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("events")).sum == 4)
  }
}
