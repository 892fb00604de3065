package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** JPEG/EXIF segment surgery (llm/Multimodal jpegExif / stripJpegMeta /
  * withPlantedExif): plant→extract→strip byte-exact, inline vs
  * offset-addressed ASCII layouts, big-endian TIFF, truncated-segment
  * audit, COM strip, pixels untouched.
  */
class JpegExifSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Array[Byte])*) =
    rows.toDF("id", "payload")

  private val base = Multimodal.syntheticGrayJpeg(7L)

  test("plant → extract → strip is byte-exact and lossless") {
    val planted = Multimodal.withPlantedExif(
      df((7L, base)).withColumn("a", lit("the author"))
        .withColumn("d", lit("en")),
      "id", "payload", Seq("artist" -> "a", "description" -> "d"))
    val tags = Multimodal.jpegExif(planted, "id", "payload")
      .orderBy("tag").collect()
    assert(tags.map(r => (r.getString(3), r.getString(4))).toSeq ==
      Seq("artist" -> "the author", "description" -> "en"))
    assert(tags.forall(!_.getBoolean(6)))            // corrupt = false
    assert(tags.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8)) // SOF
    // strip(planted) == strip(original) BYTE-exact, and the planted
    // bytes_saved delta is the full APP1 cost: 48 + |"the author"|+1
    // (out-of-line) + 0 ("en"+NUL = 3 <= 4, inline)
    val sp = Multimodal.stripJpegMeta(planted, "id", "payload").collect()(0)
    val so = Multimodal.stripJpegMeta(df((7L, base)), "id", "payload")
      .collect()(0)
    assert(java.util.Arrays.equals(
      sp.getAs[Array[Byte]](1), so.getAs[Array[Byte]](1)))
    assert(sp.getLong(2) - so.getLong(2) == 48L + 11L)
    // pixels untouched: the stripped payload still decodes to 8x8
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sp.getAs[Array[Byte]](1)))
    assert(img != null && img.getWidth == 8 && img.getHeight == 8)
  }

  test("inline (<=4 incl. NUL) and offset-addressed ASCII both round-trip") {
    val planted = Multimodal.withPlantedExif(
      df((1L, base)).withColumn("a", lit("abc"))      // 4 bytes -> inline
        .withColumn("d", lit("abcdef")),              // 7 bytes -> offset
      "id", "payload", Seq("artist" -> "a", "description" -> "d"))
    val tags = Multimodal.jpegExif(planted, "id", "payload")
      .orderBy("tag").collect()
    assert(tags.map(r => (r.getString(3), r.getString(4))).toSeq ==
      Seq("artist" -> "abc", "description" -> "abcdef"))
  }

  test("big-endian (MM) TIFF parses identically") {
    // hand-built MM APP1: one artist tag, value offset-addressed
    val v = "Moto".getBytes("ISO-8859-1") :+ 0.toByte // 5 bytes
    val buf = new java.io.ByteArrayOutputStream()
    def w16(x: Int): Unit = { buf.write((x >> 8) & 0xff); buf.write(x & 0xff) }
    def w32(x: Int): Unit = { w16((x >> 16) & 0xffff); w16(x & 0xffff) }
    buf.write("Exif".getBytes); buf.write(0); buf.write(0)
    buf.write('M'); buf.write('M'); w16(42); w32(8)
    w16(1)                                            // one entry
    w16(0x013b); w16(2); w32(v.length); w32(8 + 2 + 12 + 4)
    w32(0)                                            // next IFD
    buf.write(v)
    val payload = buf.toByteArray
    val len = payload.length + 2
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    val jpeg = base.take(2) ++ seg ++ base.drop(2)
    val tags = Multimodal.jpegExif(df((2L, jpeg)), "id", "payload").collect()
    assert(tags.map(r => (r.getString(3), r.getString(4))).toSeq ==
      Seq("artist" -> "Moto"))
    assert(!tags(0).getBoolean(6))
  }

  test("truncated segment and non-JPEG bytes audit as corrupt, no throw") {
    val planted = Multimodal.withPlantedExif(
      df((3L, base)).withColumn("a", lit("someone")),
      "id", "payload", Seq("artist" -> "a")).collect()(0)
    val cut = planted.getAs[Array[Byte]](1).take(20)  // mid-APP1
    val out = Multimodal.jpegExif(
      df((3L, cut), (4L, "not a jpeg".getBytes)), "id", "payload")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(6)))               // corrupt latched
    assert(out.forall(_.isNullAt(3)))                 // no tags invented
    // strip never invents bytes on corrupt input
    val st = Multimodal.stripJpegMeta(df((3L, cut)), "id", "payload")
      .collect()(0)
    assert(java.util.Arrays.equals(st.getAs[Array[Byte]](1), cut))
    assert(st.getLong(2) == 0L)
  }

  test("GPS plant -> extract round-trips micro-degrees exactly, " +
      "all four sign quadrants") {
    val cases = Seq(
      (0L, 51501234L, -73999999L),   // N, W
      (1L, -33865000L, 151209000L),  // S, E
      (2L, 0L, 0L), (3L, -90000000L, -180000000L))
    val planted = Multimodal.withPlantedGps(
      cases.toDF("id", "la", "lo")
        .join(df(cases.map(c => (c._1, base)): _*), "id"),
      "id", "payload", "la", "lo")
    val out = Multimodal.jpegGps(planted, "id", "payload")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == cases.map(c => (c._1, c._2, c._3, false)))
    // an un-planted image keeps its row with null coordinates
    val none = Multimodal.jpegGps(df((9L, base)), "id", "payload")
      .collect()(0)
    assert(none.isNullAt(1) && none.isNullAt(2) && !none.getBoolean(3))
  }

  test("GPS deg/min/sec rationals convert exactly; inexact -> null") {
    def gpsSeg(parts: Seq[(Long, Long)]): Array[Byte] = {
      // one-entry IFD0 (GPSInfo ptr) + GPS IFD with lat ref + lat only
      val buf = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
      def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      buf.write("Exif".getBytes); buf.write(0); buf.write(0)
      buf.write('I'); buf.write('I'); w16(42); w32(8L)
      val gpsIfd = 8 + 2 + 12 + 4
      w16(1); w16(0x8825); w16(4); w32(1L); w32(gpsIfd.toLong)
      w32(0L)
      val valBase = gpsIfd + 2 + 4 * 12 + 4
      w16(4)
      w16(1); w16(2); w32(2L); buf.write('N'); buf.write(0); buf.write(0); buf.write(0)
      w16(2); w16(5); w32(3L); w32(valBase.toLong)
      w16(3); w16(2); w32(2L); buf.write('E'); buf.write(0); buf.write(0); buf.write(0)
      w16(4); w16(5); w32(3L); w32(valBase.toLong + 24)
      w32(0L)
      parts.foreach { case (n, d) => w32(n); w32(d) }     // lat d/m/s
      Seq((7L, 1L), (0L, 1L), (0L, 1L)).foreach { case (n, d) => w32(n); w32(d) }
      val payload = buf.toByteArray
      val len = payload.length + 2
      Array[Byte](0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    }
    def withSeg(seg: Array[Byte]) = base.take(2) ++ seg ++ base.drop(2)
    // 12 deg 30 min 36 sec = 12.510000 deg exactly
    val exact = Multimodal.jpegGps(
      df((0L, withSeg(gpsSeg(Seq((12L, 1L), (30L, 1L), (36L, 1L)))))),
      "id", "payload").collect()(0)
    assert(exact.getLong(1) == 12510000L && exact.getLong(2) == 7000000L)
    // 1/7 of a second cannot be exact micro-degrees -> null, not rounded
    val inexact = Multimodal.jpegGps(
      df((1L, withSeg(gpsSeg(Seq((12L, 1L), (0L, 1L), (1L, 7L)))))),
      "id", "payload").collect()(0)
    assert(inexact.isNullAt(1))
  }

  test("COM segments are counted and stripped; APP0 survives") {
    val comment = "scanner v1.2".getBytes("ISO-8859-1")
    val len = comment.length + 2
    val com = Array[Byte](0xff.toByte, 0xfe.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ comment
    val jpeg = base.take(2) ++ com ++ base.drop(2)
    val meta = Multimodal.jpegExif(df((5L, jpeg)), "id", "payload")
      .collect()(0)
    assert(meta.getLong(5) >= com.length.toLong)      // bytes_saved
    val st = Multimodal.stripJpegMeta(df((5L, jpeg)), "id", "payload")
      .collect()(0)
    assert(java.util.Arrays.equals(st.getAs[Array[Byte]](1),
      Multimodal.stripJpegMeta(df((5L, base)), "id", "payload")
        .collect()(0).getAs[Array[Byte]](1)))
    // APP0/JFIF still present in the stripped bytes
    val stripped = st.getAs[Array[Byte]](1)
    assert((stripped(2) & 0xff) == 0xff && (stripped(3) & 0xff) == 0xe0)
  }

  test("legal 0xFF fill bytes before a marker do not latch corrupt; " +
      "the strip still removes metadata") {
    // fill run before a COM segment (ITU T.81 B.1.1.2): previously the
    // second 0xFF read as the marker id -> corrupt=true -> the strip
    // silently returned the payload unchanged (a PII-strip miss)
    val comment = "gps was here".getBytes("ISO-8859-1")
    val len = comment.length + 2
    val com = Array[Byte](0xff.toByte, 0xfe.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ comment
    val fill = Array.fill(3)(0xff.toByte)
    val jpeg = base.take(2) ++ fill ++ com ++ base.drop(2)
    val meta = Multimodal.jpegExif(df((9L, jpeg)), "id", "payload")
      .collect()(0)
    assert(!meta.getBoolean(6), "fill bytes must not read as corrupt")
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 8) // SOF still parsed
    val st = Multimodal.stripJpegMeta(df((9L, jpeg)), "id", "payload")
      .collect()(0)
    // the COM segment is GONE (no silent miss) and the result decodes
    assert(st.getLong(2) >= com.length.toLong)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(st.getAs[Array[Byte]](1)))
    assert(img != null && img.getWidth == 8)
    // fill bytes BETWEEN kept segments are preserved verbatim (the -2
    // pseudo-segment): fill before SOI's successor on a metadata-free
    // payload round-trips byte-exact through the walk
    val keepFill = base.take(2) ++ fill ++ base.drop(2)
    val st2 = Multimodal.stripJpegMeta(df((10L, keepFill)), "id",
      "payload").collect()(0)
    assert(java.util.Arrays.equals(st2.getAs[Array[Byte]](1), keepFill))
  }

  test("planters pass null payloads through and coalesce null values " +
      "(corrupt-is-data, no executor NPE)") {
    val in = Seq((1L, base, "a", "b"), (2L, null, "a", "b"),
      (3L, base, null, null))
      .toDF("id", "payload", "v1", "v2")
    val planted = Multimodal.withPlantedExif(in, "id", "payload",
      Seq("artist" -> "v1", "description" -> "v2")).orderBy("id").collect()
    assert(planted(1).isNullAt(1))                 // null payload rides
    assert(planted(0).getAs[Array[Byte]](1).length > base.length)
    // null values coalesce to "" — the tags come back empty, not NPE
    val tags = Multimodal.jpegExif(
        Multimodal.withPlantedExif(in.filter(col("id") === 3L), "id",
          "payload", Seq("artist" -> "v1")), "id", "payload").collect()
    assert(tags.exists(r => r.getString(3) == "artist" &&
      r.getString(4) == ""))
    val gin = Seq((1L, base, Some(1000L), Some(2000L)),
      (2L, null, Some(1L), Some(2L)), (3L, base, None, None))
      .toDF("id", "payload", "la", "lo")
    val g = Multimodal.withPlantedGps(gin, "id", "payload", "la", "lo")
      .orderBy("id").collect()
    assert(g(1).isNullAt(1))
    val coords = Multimodal.jpegGps(
      Multimodal.withPlantedGps(gin.filter(col("id") === 3L), "id",
        "payload", "la", "lo"), "id", "payload").collect()(0)
    assert(coords.getLong(1) == 0L && coords.getLong(2) == 0L)
  }
}
