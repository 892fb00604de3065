package graft

import java.io.{ByteArrayOutputStream, File}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.WarcIngest

/** WARC/WET crawl-archive ingest (sources/WarcIngest.scala): hand-built
  * multi-record archives round-trip (plain + per-record-member gzip +
  * whole-file gzip, CRLF + bare-LF), the writer→reader round trip,
  * the WET conversion projection, and the corrupt-file audit.
  */
class WarcIngestSpec extends SparkSpec {

  /** Render one record with the given line terminator. */
  private def record(warcType: String, id: String, uri: String,
                     payload: Array[Byte], eol: String): Array[Byte] = {
    val head = (s"WARC/1.0$eol" +
      s"WARC-Type: $warcType$eol" +
      s"WARC-Record-ID: $id$eol" +
      s"WARC-Date: 2026-01-01T00:00:00Z$eol" +
      s"WARC-Target-URI: $uri$eol" +
      s"Content-Type: text/plain$eol" +
      s"Content-Length: ${payload.length}$eol$eol")
      .getBytes(StandardCharsets.UTF_8)
    val tail = s"$eol$eol".getBytes(StandardCharsets.UTF_8)
    head ++ payload ++ tail
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos); g.write(b); g.close()
    bos.toByteArray
  }

  test("hand-built archives: plain CRLF, bare-LF, member-gzip, whole-gzip") {
    val dir = Files.createTempDirectory("graft-warc").toFile
    val p1 = "hello web".getBytes(StandardCharsets.UTF_8)
    val p2 = "payload\r\nwith embedded\n\nblank lines".getBytes(StandardCharsets.UTF_8)
    val p3 = "third".getBytes(StandardCharsets.UTF_8)
    // plain archive, CRLF, two records
    Files.write(new File(dir, "a.warc").toPath,
      record("conversion", "<urn:a:1>", "https://x/1", p1, "\r\n") ++
        record("response", "<urn:a:2>", "https://x/2", p2, "\r\n"))
    // bare-LF archive (real dumps mix terminators)
    Files.write(new File(dir, "b.wet").toPath,
      record("conversion", "<urn:b:1>", "https://x/3", p3, "\n"))
    // one gzip MEMBER per record (CommonCrawl layout)
    Files.write(new File(dir, "c.warc.gz").toPath,
      gz(record("conversion", "<urn:c:1>", "https://x/4", p1, "\r\n")) ++
        gz(record("conversion", "<urn:c:2>", "https://x/5", p3, "\r\n")))
    // whole-file gzip (single member over two records)
    Files.write(new File(dir, "d.wet.gz").toPath,
      gz(record("conversion", "<urn:d:1>", "https://x/6", p2, "\r\n") ++
        record("conversion", "<urn:d:2>", "https://x/7", p1, "\r\n")))
    // corrupt: truncated payload (Content-Length overruns the file)
    val trunc = record("conversion", "<urn:e:1>", "https://x/8", p1, "\r\n")
    Files.write(new File(dir, "e.warc").toPath,
      record("conversion", "<urn:e:0>", "https://x/9", p3, "\r\n") ++
        trunc.take(trunc.length - p1.length - 2).toArray)
    // not a WARC at all — glob must skip it
    Files.write(new File(dir, "noise.txt").toPath, "nope".getBytes)

    val (rows, audit) = WarcIngest.readWarcDir(spark, dir.getAbsolutePath)
    val got = rows.collect().map(r => (r.getAs[String]("record_id"),
      r.getAs[String]("rel_path"), r.getAs[Long]("record_idx"),
      new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8)))
      .sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("<urn:a:1>", "<urn:a:2>", "<urn:b:1>",
      "<urn:c:1>", "<urn:c:2>", "<urn:d:1>", "<urn:d:2>", "<urn:e:0>"))
    // payload bytes exact, including embedded CRLFs and blank lines
    assert(got.find(_._1 == "<urn:a:2>").get._4 ==
      "payload\r\nwith embedded\n\nblank lines")
    assert(got.find(_._1 == "<urn:d:2>").get._4 == "hello web")
    // record_idx counts within the file
    assert(got.find(_._1 == "<urn:c:2>").get._3 == 1L)

    val a = audit.collect().map(r => r.getAs[String]("rel_path") ->
      ((r.getAs[Long]("n_records"), r.getAs[Boolean]("corrupt")))).toMap
    assert(a("a.warc") == ((2L, false)))
    assert(a("b.wet") == ((1L, false)))
    assert(a("c.warc.gz") == ((2L, false)))
    assert(a("d.wet.gz") == ((2L, false)))
    // corrupt file keeps the records decoded before the damage
    assert(a("e.warc") == ((1L, true)))
    assert(!a.contains("noise.txt"))
  }

  test("writer → reader round trip (gzip and plain) + WET projection") {
    import spark.implicits._
    val df = Seq(
      ("conversion", "<urn:w:1>", "https://w/1", "2026-02-02T00:00:00Z",
        "text/plain", "alpha beta"),
      ("conversion", "<urn:w:2>", "https://w/2", "2026-02-02T00:00:00Z",
        "text/plain", "gamma"),
      ("request", "<urn:w:3>", "https://w/3", "2026-02-02T00:00:00Z",
        "application/http", "GET / HTTP/1.1"))
      .toDF("warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "text")
      .withColumn("payload", org.apache.spark.sql.functions
        .encode(org.apache.spark.sql.functions.col("text"), "UTF-8"))
      .drop("text")
    for (gzip <- Seq(true, false)) {
      val out = Files.createTempDirectory(s"graft-warc-w$gzip").toString
      val n = WarcIngest.writeWarcDir(df.repartition(2), out, gzip = gzip)
      assert(n == 3L)
      val (rows, audit) = WarcIngest.readWarcDir(spark, out)
      assert(audit.filter("corrupt").count() == 0)
      val back = rows.collect()
        .map(r => r.getAs[String]("record_id") ->
          new String(r.getAs[Array[Byte]]("payload"),
            StandardCharsets.UTF_8)).toMap
      assert(back == Map("<urn:w:1>" -> "alpha beta",
        "<urn:w:2>" -> "gamma", "<urn:w:3>" -> "GET / HTTP/1.1"))
      // WET projection: conversion records only, payload decoded
      val wet = WarcIngest.wetText(rows).collect()
        .map(r => r.getAs[String]("record_id") -> r.getAs[String]("text"))
        .toMap
      assert(wet == Map("<urn:w:1>" -> "alpha beta", "<urn:w:2>" -> "gamma"))
    }
  }

  test("whole-file garbage decodes as zero records, corrupt, no exception") {
    val dir = Files.createTempDirectory("graft-warc-bad").toFile
    Files.write(new File(dir, "junk.warc").toPath,
      Array.tabulate[Byte](512)(i => (i * 7).toByte))
    val (rows, audit) = WarcIngest.readWarcDir(spark, dir.getAbsolutePath)
    assert(rows.count() == 0)
    val a = audit.collect()
    assert(a.length == 1 && a(0).getAs[Boolean]("corrupt") &&
      a(0).getAs[Long]("n_records") == 0L)
  }
}
