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

  /** Decode `&#N;` numeric character references to their CHARACTER for
    * printable ASCII (32–126, which covers the refs FBref actually emits
    * — `&#39;` apostrophes above all); refs outside that range pass
    * through intact rather than decode wrong. Pure codegen'd column ops:
    * the text splits on the ref pattern, each captured N maps through
    * `char(N)`, and the pieces zip back together — no UDF. (An earlier
    * version replaced `&#(\d+);` with its bare DIGITS, so `O&#39;Brien`
    * parsed as `O39Brien`; pinned in HtmlTablesSpec.)
    */
  private[sources] def decodeNumericRefs(c: Column): Column = {
    val parts = split(c, "&#\\d+;", -1)
    val ents = regexp_extract_all(c, lit("&#(\\d+);"), lit(1))
    val stitched = zip_with(slice(parts, lit(1), size(ents)), ents,
      (p, e) => concat(p,
        when(e.cast("int").between(32, 126),
          call_function("char", e.cast("bigint")))
          .otherwise(concat(lit("&#"), e, lit(";")))))
    when(size(ents) <= 0, c)
      .otherwise(concat(array_join(stitched, ""), element_at(parts, -1)))
  }

  /** Decode the XML named entities + `&nbsp;`, then numeric refs, then
    * `&amp;` LAST — so `&amp;lt;` decodes to the literal `&lt;` and
    * `&#38;#39;` to the literal `&#39;` (double-escaped refs never
    * double-decode).
    */
  def htmlUnescape(c: Column): Column = {
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ")
    val afterNamed = named.foldLeft(c) { case (acc, (e, r)) =>
      regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(r))
    }
    regexp_replace(decodeNumericRefs(afterNamed), "&amp;",
      java.util.regex.Matcher.quoteReplacement("&"))
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

  /** Visible text of a whole page — the WARC `response` → WET
    * `conversion` extraction step (what CommonCrawl's WET generator
    * does to each crawled page): comments removed WHOLESALE (content
    * and all — the opposite of [[uncomment]], which reveals
    * commented-out tables for the FBref quirk), `<script>`/`<style>`
    * blocks dropped with their contents (code is not prose), remaining
    * tags become spaces, entities decode, whitespace collapses to
    * single spaces. Pure codegen'd column ops — a billion pages reduce
    * to text as one distributed projection, no UDF. Entity decode runs
    * AFTER tag stripping so `&lt;script&gt;` in text can never smuggle
    * a strippable block.
    */
  def visibleText(page: Column): Column = {
    val noComments = regexp_replace(page, "(?s)<!--.*?-->", "")
    val noBlocks = regexp_replace(noComments,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1>", "")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    trim(regexp_replace(htmlUnescape(noTags), "\\s+", " "))
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
