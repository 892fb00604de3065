package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine HTML `<table>` extraction — the engine-side twin of the
  * reference's `pd.read_html` step (`scrapers/daily_match_scraper.py:365`,
  * `scrapers/team_scraper.py:340-358`), closing the last literal ingest
  * delta: S3–S5 previously consumed PRE-parsed tables; with this, the
  * captured page text itself is the input and the whole
  * parse → resolveColumns → cleanMatchlog / pivotStats chain runs
  * in-engine.
  *
  * Pure column expressions (`regexp_extract_all` / `transform` /
  * `posexplode`) — codegen'd, scan-speed, zero UDFs — so a million
  * captured pages parse as one distributed projection. The only driver
  * work is a ONE-row collect to read the header row (plan-time schema
  * resolution, the same cost class as [[Ingest.resolveColumns]]'s
  * column-name scan).
  *
  * Scope (documented, deliberate): non-nested tables — the FBref/
  * flashscore shapes the reference scrapes. A nested `<table>` inside a
  * cell would end the outer match early; the reference's pandas path
  * never encounters one and neither do we. HTML comments are stripped
  * FIRST because FBref ships most stat tables inside `<!-- -->` blocks
  * (the quirk `team_scraper.py` works around by re-parsing comment
  * text).
  */
object HtmlTables {

  /** Strip comment markers so commented-out tables (the FBref quirk)
    * become visible to the table regex.
    */
  def uncomment(page: Column): Column =
    regexp_replace(page, "(?s)<!--|-->", "")

  /** Decode the five XML entities plus `&nbsp;`/`&#\d+;` numeric refs —
    * `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`.
    */
  def htmlUnescape(c: Column): Column = {
    val numeric = regexp_replace(c, "&#(\\d+);", "$1") // rare; keep digits
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(numeric) { case (acc, (e, r)) =>
      regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(r))
    }
  }

  /** One cell's visible text: inner tags dropped, entities decoded,
    * trimmed; a blank cell becomes NULL (the `pd.read_html` NaN
    * convention, which is what lets `cleanMatchlog`'s separator-row
    * drop work unchanged).
    */
  private def cellText(cell: Column): Column = {
    val txt = trim(htmlUnescape(
      regexp_replace(cell, "(?s)<[^>]*>", "")))
    when(txt === "", lit(null)).otherwise(txt)
  }

  /** All `<table>` bodies of a page, comment-stripped. */
  def tables(page: Column): Column =
    regexp_extract_all(uncomment(page),
      lit("(?is)<table\\b[^>]*>(.*?)</table>"), lit(1))

  /** LONG form of one table per page: (keyCols…, row_idx, cells) with
    * `cells` the array of visible cell texts (`<th>` and `<td>` alike —
    * header and separator rows are rows; the caller decides their
    * fate, exactly as pandas returns them).
    */
  def tableCells(pages: DataFrame, pageCol: String, keyCols: Seq[String],
                 tableIdx: Int = 0): DataFrame = {
    val ks = keyCols.map(col)
    pages
      .withColumn("__tbl", element_at(tables(col(pageCol)), tableIdx + 1))
      .filter(col("__tbl").isNotNull)
      .select(ks :+ posexplode(regexp_extract_all(col("__tbl"),
        lit("(?is)<tr\\b[^>]*>(.*?)</tr>"), lit(1)))
        .as(Seq("row_idx", "__row")): _*)
      .withColumn("cells",
        transform(regexp_extract_all(col("__row"),
          lit("(?is)<t[hd]\\b[^>]*>(.*?)</t[hd]>"), lit(1)),
          cellText _))
      .select(ks ++ Seq(col("row_idx"), col("cells")): _*)
  }

  /** WIDE form — the `pd.read_html(...)[tableIdx]` equivalent: column
    * names from the table's first (header) row, one output row per data
    * row. Header resolution collects ONE row; duplicate/blank header
    * cells are uniquified positionally (`col_3`) so the frame is always
    * selectable. Feed the result straight to [[Ingest.resolveColumns]] /
    * [[Ingest.cleanMatchlog]] / [[Ingest.pivotStats]].
    */
  def parseTable(pages: DataFrame, pageCol: String,
                 keyCols: Seq[String] = Nil,
                 tableIdx: Int = 0): DataFrame = {
    val long = tableCells(pages, pageCol, keyCols, tableIdx)
    val header = long.filter(col("row_idx") === 0)
      .select(col("cells")).limit(1).collect() match {
      case Array(r) => r.getSeq[String](0)
      case _ => throw new IllegalArgumentException(
        s"parseTable: no table #$tableIdx in column $pageCol")
    }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = header.zipWithIndex.map { case (h, i) =>
      val base = Option(h).map(_.trim).filter(_.nonEmpty)
        .getOrElse(s"col_$i")
      val n = seen.getOrElse(base.toLowerCase, 0)
      seen(base.toLowerCase) = n + 1
      if (n == 0) base else s"${base}_$n"
    }
    long.filter(col("row_idx") > 0)
      .select(keyCols.map(col) ++ names.zipWithIndex.map { case (n, i) =>
        element_at(col("cells"), i + 1).as(n)
      }: _*)
  }
}
