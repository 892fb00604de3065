package graft

import org.apache.spark.sql.functions._

import graft.llm.CorpusPipeline

/** End-to-end corpus cleaning: each gate exercised by a planted doc. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and runs to the green hills"
  private val docs = Seq(
    (0L, base),                          // survivor (cluster representative)
    (1L, base),                          // exact dup of 0 → dropped
    (2L, base.replace("green", "blue")), // near dup of 0 → dropped
    (3L, "word junk"),                   // too short / no stopwords → quality gate
    (4L, "el perro de la casa y el gato en los arboles que corren del rio")
  ).toDF("doc_id", "text")               // doc 4: Spanish → language gate

  test("cleanCorpus: quality, language, exact-dup and near-dup gates") {
    val out = CorpusPipeline.cleanCorpus(docs)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
  }

  test("cleanStats reports the drop accounting") {
    val cleaned = CorpusPipeline.cleanCorpus(docs)
    val r = CorpusPipeline.cleanStats(docs, cleaned).head()
    assert(r.getAs[Long]("input_docs") == 5L)
    assert(r.getAs[Long]("surviving_docs") == 1L)
    assert(r.getAs[Long]("dropped_docs") == 4L)
  }

  test("minhash variant prunes the same planted near-dup cluster") {
    val out = CorpusPipeline.cleanCorpus(docs, useMinhash = true)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
  }

  test("transitive mode keeps exactly one doc per dup cluster") {
    val out = CorpusPipeline.cleanCorpus(docs, transitive = true)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
  }
}
