package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract plumbing.
  *
  * The GENERIC decode step is STUBBED (no image/video libraries in this
  * environment) with a deterministic fake — but the Spark-side contract
  * is real: schema, batched per-partition execution (the Scala analog of
  * `mapInPandas`: one iterator pass per partition, no per-row task
  * overhead, no driver collect), and partition sizing controls. The AUDIO
  * modality is decoded for REAL: WAV/PCM parsing is pure byte arithmetic
  * (`decodeWav`), so that path needs no stub at all.
  */
object Multimodal {

  /** Attach a binary payload column + extracted metadata. In production
    * the payload arrives from parquet/binaryFile sources; here text bytes
    * stand in. Metadata extraction is expression-only (codegen'd).
    */
  def withBinaryMetadata(df: DataFrame, payloadCol: String): DataFrame = {
    val blob = encode(col(payloadCol), "UTF-8")
    df.withColumn("payload", blob)
      .withColumn("byte_len", length(blob).cast("long"))
      .withColumn("content_sha", sha2(blob, 256))
      // magic-byte sniffing pattern (real formats: 89504E47=PNG etc.)
      .withColumn("format_tag", hex(substring(blob, 1, 2)))
  }

  val FeatureDim = 16

  /** Batched "decode + feature extract" over binary payloads — the
    * mapInPandas-shaped pass. The real decoder is a stub: a deterministic
    * hash-seeded pseudo-feature vector, so tests exercise the plumbing
    * (schema, batching, partitioning) with stable outputs.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    val in = df.select(col(idCol).cast("long").as("id"), col("payload"))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      // One pass per partition; in production this is where a native
      // decoder batch-processes the payloads.
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length.toLong, fakeDecode(payload))
      }
    }(encoder)
  }

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * Replace with a real image/audio decode in production.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < FeatureDim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffff).toFloat / 0xffff.toFloat) - 0.5f
      j += 1
    }
    out
  }

  /** Frame-sampling plumbing: given per-asset frame counts, emit
    * (asset, frame_idx) rows for every nth frame — the fan-out shape a
    * video pipeline needs before per-frame decode. Pure expressions.
    */
  def sampleFrames(df: DataFrame, idCol: String, frameCountCol: String,
                   everyNth: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)),
          lit(everyNth))).as("frame_idx"))

  // ------------------------------------------------------- real decode: WAV

  /** One modality decoded for REAL: WAV/PCM is RIFF chunks + little-endian
    * 16-bit samples — pure byte arithmetic, no native library. Parsed
    * fields plus per-window RMS energy (the standard cheap audio
    * fingerprint). Returns null fields on anything that is not a
    * well-formed 16-bit PCM WAV: at corpus scale corrupt payloads are
    * data, not exceptions.
    */
  def decodeAudioFeatures(df: DataFrame, idCol: String,
                          windows: Int = FeatureDim): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("num_samples", LongType),
      StructField("rms", ArrayType(FloatType))))
    val in = df.select(col(idCol).cast("long").as("id"), col("payload"))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        decodeWav(r.getAs[Array[Byte]](1), windows) match {
          case Some((rate, n, rms)) => Row(id, rate, n, rms)
          case None => Row(id, null, null, null)
        }
      }
    }(encoder)
  }

  /** RIFF/WAVE walker for 16-bit PCM (mono or stereo, channels averaged).
    * @return (sampleRate, numSamples, per-window RMS of [-1,1] samples)
    */
  def decodeWav(bytes: Array[Byte], windows: Int): Option[(Int, Long, Array[Float])] = {
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None

    var fmtOk = false; var channels = 0; var rate = 0
    var dataOff = -1; var dataLen = 0
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = tag(pos); val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(pos + 8)
          channels = le16(pos + 10)
          rate = le32(pos + 12)
          val bits = le16(pos + 22)
          fmtOk = audioFormat == 1 && bits == 16 &&
            (channels == 1 || channels == 2) && rate > 0
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val frameBytes = 2 * channels
    val n = dataLen / frameBytes
    if (n == 0) return None

    // Per-window sum of squares in double; sequential order, reproducible.
    val rms = new Array[Float](windows)
    var w = 0
    while (w < windows) {
      val lo = (n.toLong * w / windows).toInt
      val hi = (n.toLong * (w + 1) / windows).toInt
      var ss = 0.0; var i = lo
      while (i < hi) {
        var c = 0; var acc = 0.0
        while (c < channels) {
          val s = le16(dataOff + i * frameBytes + 2 * c).toShort
          acc += s / 32768.0; c += 1
        }
        val x = acc / channels
        ss += x * x; i += 1
      }
      rms(w) = if (hi > lo) math.sqrt(ss / (hi - lo)).toFloat else 0f
      w += 1
    }
    Some((rate, n.toLong, rms))
  }
}
