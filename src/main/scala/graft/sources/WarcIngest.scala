package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC / WET crawl-archive ingest (ISO 28500 / the CommonCrawl layout)
  * — the canonical input format of a web-scale text corpus, and the
  * third connector-free container format beside Avro OCF
  * ([[AvroIngest]]) and ORC. Spark ships no WARC reader, so this module
  * follows the same pattern: [[Ingest.readBinaryDir]] does the
  * listing-time glob pruning, then each archive decodes inside ONE
  * `mapPartitions` pass — files decode fully parallel, one record walk
  * per file, and the decoded form (not the raw payload) is what
  * persists for the rows + audit projections.
  *
  * Record walk (the public WARC 1.0/1.1 layout): a `WARC/x.y` version
  * line, `Name: value` header lines up to an empty line, exactly
  * `Content-Length` payload octets, then a blank-line record separator.
  * Both CRLF and bare-LF line ends are accepted (real crawl dumps mix
  * them). A `.gz` archive is the usual multi-member gzip — one
  * deflate member per record, concatenated — which
  * `java.util.zip.GZIPInputStream` walks transparently; plain archives
  * decode as-is. WET files ARE WARC files whose records are
  * `conversion` text records, so [[wetText]] is a projection, not a
  * second parser.
  *
  * Corrupt-is-data (the 100 TB posture, same as `AvroIngest`): a
  * truncated or garbled archive contributes every record decoded
  * before the damage and is counted in the audit frame — never an
  * executor exception. Only NonFatal damage is absorbed; OOM or task
  * kill still fails the task.
  */
object WarcIngest {

  /** One decoded WARC record: position in its file, the five headers a
    * corpus pipeline filters on, and the raw payload octets.
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate ALL members of a (possibly multi-member) gzip stream. */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 64 * 1024)
    val out = new ByteArrayOutputStream(math.max(b.length * 4, 1024))
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Read one header/version line starting at `p`; returns (line text
    * without the terminator, position after the terminator). Accepts
    * CRLF and bare LF.
    */
  private def readLine(d: Array[Byte], p: Int): (String, Int) = {
    var e = p
    while (e < d.length && d(e) != '\n') e += 1
    val endTrim = if (e > p && d(e - 1) == '\r') e - 1 else e
    (new String(d, p, endTrim - p, StandardCharsets.UTF_8),
      math.min(e + 1, d.length))
  }

  /** Walk every record of one (decompressed-if-gzip) archive.
    * Returns (decoded rows, sawCorruption).
    */
  private[sources] def decodeFile(bytes: Array[Byte]): (Seq[Row], Boolean) = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val d = if (isGzip(bytes)) gunzipAll(bytes) else bytes
      var p = 0
      var idx = 0L
      while (p < d.length) {
        // skip inter-record blank lines
        while (p < d.length && (d(p) == '\r' || d(p) == '\n')) p += 1
        if (p < d.length) {
          val (ver, p1) = readLine(d, p)
          require(ver.startsWith("WARC/"),
            s"record $idx: expected WARC version line, got '${ver.take(40)}'")
          var q = p1
          val hdrs = scala.collection.mutable.Map.empty[String, String]
          var line = ""
          var cont = true
          while (cont) {
            val (l, nq) = readLine(d, q)
            line = l; q = nq
            if (line.isEmpty) cont = false
            else {
              val c = line.indexOf(':')
              require(c > 0, s"record $idx: malformed header '${line.take(40)}'")
              hdrs += line.substring(0, c).trim.toLowerCase ->
                line.substring(c + 1).trim
            }
          }
          val len = hdrs.getOrElse("content-length",
            sys.error(s"record $idx: missing Content-Length")).toLong
          require(q + len <= d.length,
            s"record $idx: payload truncated (${d.length - q} < $len)")
          val payload = java.util.Arrays.copyOfRange(d, q, q + len.toInt)
          rows += Row(idx, hdrs.getOrElse("warc-type", null),
            hdrs.getOrElse("warc-record-id", null),
            hdrs.getOrElse("warc-target-uri", null),
            hdrs.getOrElse("warc-date", null),
            hdrs.getOrElse("content-type", null),
            len, payload)
          idx += 1
          p = q + len.toInt
        }
      }
      (rows.toSeq, false)
    } catch {
      case scala.util.control.NonFatal(_) => (rows.toSeq, true)
    }
  }

  /** Read every WARC/WET archive under `dir` (default glob catches
    * `.warc`, `.warc.gz`, `.wet`, `.wet.gz`). Returns (records frame in
    * [[recordSchema]] + `rel_path`, per-file audit frame
    * (rel_path, n_records, corrupt)).
    *
    * Each archive decodes ONCE: a single `mapPartitions` emits one
    * (rel_path, corrupt, records[]) row per file, persisted
    * MEMORY_AND_DISK, and both projections read the decoded form — one
    * decompress + record walk per file however both frames are
    * consumed.
    */
  def readWarcDir(spark: SparkSession, dir: String,
                  glob: String = "*.{warc,wet}*"): (DataFrame, DataFrame) = {
    val files = Ingest.readBinaryDir(spark, dir, glob = glob)
      .select(col("rel_path"), col("payload"))
    val combinedSchema = StructType(Seq(
      StructField("rel_path", StringType),
      StructField("corrupt", BooleanType),
      StructField("records", ArrayType(recordSchema))))
    val enc = RowEncoder.encoderFor(combinedSchema)
    val decoded = files.mapPartitions { it =>
      it.map { r =>
        val (rs, bad) = decodeFile(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[String]("rel_path"), bad, rs)
      }
    }(enc).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = decoded
      .select(col("rel_path"), explode(col("records")).as("__r"))
      .select(col("rel_path") +: recordSchema.fieldNames.toSeq
        .map(f => col(s"__r.$f")): _*)
    val audit = decoded.select(col("rel_path"),
      size(col("records")).cast("long").as("n_records"), col("corrupt"))
    (rows, audit)
  }

  /** WET projection: `conversion` records as UTF-8 text — the shape a
    * training-data pipeline feeds straight into dedup/quality scoring.
    */
  def wetText(records: DataFrame): DataFrame =
    records.filter(col("warc_type") === "conversion")
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        col("content_length"),
        decode(col("payload"), "UTF-8").as("text"))

  /** K-sink twin of [[readWarcDir]]: one archive per non-empty input
    * partition (`part-NNNNN.warc[.gz]`), records in partition order,
    * written through the Hadoop FileSystem API (file://, HDFS, object
    * stores). Executors write in parallel — no driver collect; returns
    * records written.
    *
    * Input schema: (warc_type, record_id, target_uri, warc_date,
    * content_type all STRING; payload BINARY). Headers render CRLF,
    * payloads verbatim, the standard blank-line separator after each
    * record — so [[readWarcDir]] (and any external WARC reader)
    * round-trips the archive.
    */
  def writeWarcDir(df: DataFrame, dir: String, gzip: Boolean = true): Long = {
    val schema = df.schema
    val fi = Map("warc_type" -> schema.fieldIndex("warc_type"),
      "record_id" -> schema.fieldIndex("record_id"),
      "target_uri" -> schema.fieldIndex("target_uri"),
      "warc_date" -> schema.fieldIndex("warc_date"),
      "content_type" -> schema.fieldIndex("content_type"),
      "payload" -> schema.fieldIndex("payload"))
    val ext = if (gzip) ".warc.gz" else ".warc"
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (!rows.hasNext) Iterator.single(0L)
      else {
        val conf = new org.apache.hadoop.conf.Configuration()
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$idx%05d$ext")
        val fs = path.getFileSystem(conf)
        val raw = fs.create(path, true)
        // one gzip member per RECORD (the CommonCrawl layout): a reader
        // can seek to a member boundary and decode one record alone
        var n = 0L
        try {
          rows.foreach { r =>
            val payload = r.getAs[Array[Byte]](fi("payload"))
            val sb = new StringBuilder("WARC/1.0\r\n")
            def h(name: String, key: String): Unit = {
              val v = r.get(fi(key))
              if (v != null) sb.append(name).append(": ")
                .append(v.toString).append("\r\n")
            }
            h("WARC-Type", "warc_type")
            h("WARC-Record-ID", "record_id")
            h("WARC-Date", "warc_date")
            h("WARC-Target-URI", "target_uri")
            h("Content-Type", "content_type")
            sb.append("Content-Length: ").append(payload.length)
              .append("\r\n\r\n")
            val head = sb.toString.getBytes(StandardCharsets.UTF_8)
            val tail = "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
            if (gzip) {
              val bos = new ByteArrayOutputStream(
                head.length + payload.length + 64)
              val gz = new GZIPOutputStream(bos)
              gz.write(head); gz.write(payload); gz.write(tail); gz.close()
              raw.write(bos.toByteArray)
            } else {
              raw.write(head); raw.write(payload); raw.write(tail)
            }
            n += 1
          }
        } finally raw.close()
        Iterator.single(n)
      }
    }.sum().toLong
  }
}
