package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.llm.Multimodal
import graft.sources.Ingest

/** `binaryFile` media ingest (Ingest.readBinaryDir): glob pruning,
  * recursive listing, size cap, path-stable ids, and composition with
  * the real image decoder.
  */
class BinaryIngestSpec extends SparkSpec {

  test("reads a media tree into the multimodal payload contract") {
    val dir = Files.createTempDirectory("graft-bin").toFile.getAbsolutePath
    Files.createDirectories(Paths.get(dir, "sub"))
    val png1 = Multimodal.syntheticGrayPng(1L)
    val png2 = Multimodal.syntheticGrayPng(2L)
    Files.write(Paths.get(dir, "a.png"), png1)
    Files.write(Paths.get(dir, "sub", "b.png"), png2)
    Files.write(Paths.get(dir, "notes.txt"), "not media".getBytes)
    Files.write(Paths.get(dir, "huge.png"), new Array[Byte](4096))

    val read = Ingest.readBinaryDir(spark, dir, glob = "*.png",
      maxBytes = 2048)
    val rows = read.orderBy("rel_path").collect()

    // txt pruned by glob; huge.png KEEPS its row (no silent caps) but
    // its payload is null — the size cap strips bytes, never rows
    assert(rows.map(_.getAs[String]("rel_path")).toSeq ==
      Seq("a.png", "huge.png", "sub/b.png"))
    assert(rows.forall(_.getAs[Long]("id") > 0L))
    assert(rows.map(_.getAs[Long]("id")).distinct.length == 3)
    assert(rows(0).getAs[Array[Byte]]("payload").sameElements(png1))
    val huge = rows(1)
    assert(huge.getAs[Array[Byte]]("payload") == null &&
      huge.getAs[Long]("length") == 4096L)

    // ids depend only on RELATIVE paths: re-rooting the same tree
    // elsewhere yields identical ids (content-addressable across
    // clusters with different mount points)
    val dir2 = Files.createTempDirectory("graft-bin2").toFile.getAbsolutePath
    Files.createDirectories(Paths.get(dir2, "sub"))
    Files.write(Paths.get(dir2, "a.png"), png1)
    Files.write(Paths.get(dir2, "sub", "b.png"), png2)
    val ids1 = read.filter("payload IS NOT NULL")
      .select("rel_path", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids2 = Ingest.readBinaryDir(spark, dir2, glob = "*.png")
      .select("rel_path", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids1 == ids2)

    // composes with the real decoder: the two real PNGs decode, the
    // payload-null oversize row flows through as non-decodable
    // (corrupt-is-data), never an exception
    val viaFiles = Multimodal.decodeImageFeatures(read, "id")
      .orderBy("id").collect()
    assert(viaFiles.length == 3)
    assert(viaFiles.count(_.isNullAt(1)) == 1) // the oversize row
    assert(viaFiles.filter(!_.isNullAt(1)).forall(r =>
      r.getAs[Int]("width") == 8 && r.getAs[Long]("sum_gray") > 0L))
  }
}
