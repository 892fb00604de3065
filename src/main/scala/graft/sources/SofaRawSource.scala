package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for the reference's raw API capture files
  * (`sofascore_data/raw/api_response_*.txt`: an HTTP status+headers
  * preamble, then a JSON body — SURVEY §1.2.6, S1/S2). Each file becomes
  * one row `(source_file, body)` with the preamble stripped; JSON
  * decoding stays in the engine (`from_json` with the declared
  * `Tables.sofaEvent` schema) where Catalyst can prune it.
  *
  * Scale shape: one `InputPartition` per file (captures are small
  * per-day files); readers open files through the Hadoop FileSystem API,
  * so any supported filesystem works. Usage:
  * `spark.read.format("graft.sources.SofaRawSource").load(dir)` or
  * `Ingest.readSofaCaptures(spark, dir)` for the exploded event rows.
  */
class SofaRawSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SofaRawSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SofaRawTable(properties.get("path"))
}

object SofaRawSource {
  val schema: StructType = StructType(Seq(
    StructField("source_file", StringType, nullable = false),
    StructField("body", StringType, nullable = true)))

  /** Preamble strip: the JSON body starts at the first character that
    * opens a JSON value (HTTP status/header lines contain none).
    */
  def stripPreamble(content: String): String = {
    val i = content.indexWhere(c => c == '{' || c == '[')
    if (i < 0) null else content.substring(i).trim
  }
}

private class SofaRawTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sofaraw(`$path`)"
  override def schema(): StructType = SofaRawSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      // The SESSION Hadoop configuration (fs credentials, s3a/hdfs
      // settings, `spark.hadoop.*` overrides) — a bare `new Configuration()`
      // would silently drop them. Captured once on the driver, shipped to
      // executors inside the serializable reader factory.
      private val hadoopConf = new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf())

      override def build(): Scan = this
      override def readSchema(): StructType = SofaRawSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val p = new Path(path)
        val fs = p.getFileSystem(hadoopConf.value)
        val files =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
          else Array(p.toString)
        files.sorted.map(f => SofaRawPartition(f): InputPartition)
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val conf = hadoopConf
        (partition: InputPartition) =>
          new SofaRawReader(partition.asInstanceOf[SofaRawPartition].file,
            conf)
      }
    }
}

private case class SofaRawPartition(file: String) extends InputPartition

private class SofaRawReader(file: String, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private var consumed = false

  override def next(): Boolean = !consumed

  override def get(): InternalRow = {
    consumed = true
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    InternalRow(
      UTF8String.fromString(file),
      Option(SofaRawSource.stripPreamble(content))
        .map(UTF8String.fromString).orNull)
  }

  override def close(): Unit = ()
}
