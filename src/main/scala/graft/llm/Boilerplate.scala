package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate-line removal — the CCNet/web-crawl
  * hygiene pass: a line that appears (near-)verbatim in a large fraction
  * of documents is template chrome ("subscribe to our newsletter",
  * cookie banners, copyright footers), not content, and is dropped from
  * every document while one-off lines survive in order.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the document-frequency aggregation groups on `xxhash64(line)`, so
  *    the shuffle carries 8-byte keys + doc ids, never the line text;
  *  - the hot-line set is tiny BY DEFINITION (only lines above the
  *    corpus-fraction threshold survive the HAVING), so the removal join
  *    is a broadcast LEFT ANTI — the corpus itself is never re-shuffled
  *    for the join;
  *  - reassembly is one groupBy(doc) of (pos, line) pairs — the only
  *    full-width shuffle, unavoidable for any line-level rewrite.
  * Hash-collision risk is the usual 2^-64 per distinct-line pair
  * (a collision could only over-remove a line, never corrupt one).
  */
object Boilerplate {

  /** @param minDocFrac a line is boilerplate when it appears in at least
    *   this fraction of all documents…
    * @param minDocs …and in at least this many (guards tiny corpora,
    *   where 50% of 3 docs is noise).
    * Documents whose every line is boilerplate come back with empty
    * text — the row is kept so downstream length/quality gates see it.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        minDocFrac: Double = 0.5,
                        minDocs: Long = 2L): DataFrame = {
    val lines = docs.select(col(idCol).as("__bp_id"),
        posexplode(split(col(textCol), "\n")))
      .withColumnsRenamed(Map("pos" -> "__bp_pos", "col" -> "__bp_line"))
      .withColumn("__bp_h", xxhash64(col("__bp_line")))
    val total = docs.select(countDistinct(col(idCol)).as("__bp_total"))
    val hot = lines.groupBy(col("__bp_h"))
      .agg(countDistinct(col("__bp_id")).as("__bp_df"))
      .crossJoin(broadcast(total))
      .filter(col("__bp_df") >=
        greatest(lit(minDocs), ceil(col("__bp_total") * minDocFrac)))
      .select(col("__bp_h"))
    val kept = lines.join(broadcast(hot), Seq("__bp_h"), "left_anti")
    val rebuilt = kept.groupBy(col("__bp_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__bp_pos"), col("__bp_line")))),
        s => s.getField("__bp_line")), "\n").as("__bp_text"))
    docs.join(rebuilt, col(idCol) === col("__bp_id"), "left")
      .withColumn(textCol, coalesce(col("__bp_text"), lit("")))
      .drop("__bp_id", "__bp_text")
  }
}
