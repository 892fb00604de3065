package graft

import java.io.File
import java.nio.file.Files

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.types._

import graft.sources.AvroIngest

/** Avro container-file ingest (sources/AvroIngest.scala): round trip,
  * reader-schema projection, deflate codec, corrupt-file audit.
  */
class AvroIngestSpec extends SparkSpec {

  private val avroSchema: Schema = SchemaBuilder.record("Evt").fields()
    .requiredLong("id")
    .requiredString("name")
    .optionalDouble("score")
    .endRecord()

  private def writeFile(f: File, codec: Option[String],
                        rows: Seq[(Long, String, Option[Double])]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    codec.foreach(c =>
      w.setCodec(org.apache.avro.file.CodecFactory.fromString(c)))
    w.create(avroSchema, f)
    rows.foreach { case (id, name, score) =>
      val b = new GenericRecordBuilder(avroSchema)
        .set("id", id).set("name", name)
      score.foreach(s => b.set("score", s))
      w.append(b.build())
    }
    w.close()
  }

  private val readerSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("missing_col", StringType))) // not in the writer schema

  test("round trip across codecs, schema projection, corrupt audit") {
    val dir = Files.createTempDirectory("graft-avro").toFile
    writeFile(new File(dir, "a.avro"), None,
      Seq((1L, "x", Some(0.5)), (2L, "y", None)))
    writeFile(new File(dir, "b.avro"), Some("deflate"),
      Seq((3L, "z", Some(1.25))))
    // a corrupt payload: valid magic prefix, truncated body
    val good = Files.readAllBytes(new File(dir, "a.avro").toPath)
    Files.write(new File(dir, "broken.avro").toPath, good.take(30).toArray)
    Files.write(new File(dir, "notavro.txt").toPath, "nope".getBytes)

    val (rows, audit) = AvroIngest.readAvroDir(spark,
      dir.getAbsolutePath, readerSchema)
    val got = rows.orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getString(1)).toSeq == Seq("x", "y", "z"))
    assert(got(0).getDouble(2) == 0.5 && got(2).getDouble(2) == 1.25)
    assert(got(1).isNullAt(2)) // optional -> null
    assert(got.forall(_.isNullAt(3))) // reader-only column is null

    val a = audit.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(a("a.avro") == (2L, false))
    assert(a("b.avro") == (1L, false))
    assert(a("broken.avro")._2) // flagged corrupt, no exception
    assert(!a.contains("notavro.txt")) // glob-pruned at listing time
  }

  test("engine-side writer round-trips through the reader, one file per partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro-w").toFile.getAbsolutePath
    val df = Seq(
      (1L, Some("a"), Some(0.5), true),
      (2L, None, None, false),
      (3L, Some("c"), Some(2.25), true)
    ).toDF("id", "name", "score", "flag").repartition(2)
    val n = AvroIngest.writeAvroDir(df, dir)
    assert(n == 3L)
    assert(new File(dir).listFiles().count(_.getName.endsWith(".avro")) == 2)

    val back = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType)))
    val (rows, audit) = AvroIngest.readAvroDir(spark, dir, back)
    val got = rows.orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getDouble(2) == 2.25 && got(2).getBoolean(3))
    assert(audit.collect().forall(!_.getBoolean(2))) // nothing corrupt
  }
}
