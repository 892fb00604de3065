package graft

import org.apache.spark.sql.functions._

import graft.sources.{HtmlTables, Ingest}

/** In-engine HTML `<table>` extraction (sources/HtmlTables.scala) — the
  * engine-side twin of the reference's `pd.read_html` step
  * (`scrapers/team_scraper.py:340-358`): commented-out FBref tables,
  * entity decoding (named + numeric refs), separator rows, duplicate
  * headers, and the full parseTable → resolveColumns → cleanMatchlog
  * chain over a fixture shaped like an FBref matchlog page.
  */
class HtmlTablesSpec extends SparkSpec {
  import spark.implicits._

  // FBref-shaped page: a visible nav table first, the matchlog table
  // inside an HTML comment (the FBref quirk team_scraper.py re-parses
  // comment text for), numeric + named entities in cells, a separator
  // row (all-blank cells), inner tags, and a duplicate header name.
  private val fbrefPage =
    """<html><body>
      |<table id="nav"><tr><th>ignore</th></tr>
      |  <tr><td>menu</td></tr></table>
      |<div class="placeholder">
      |<!--
      |<table id="matchlogs">
      |<thead><tr><th>Date</th><th>Opponent</th><th>GF</th><th>GA</th>
      |  <th>Notes</th><th>Notes</th></tr></thead>
      |<tbody>
      |<tr><td>2026-01-10</td><td><a href="/x">O&#39;Brien FC</a></td>
      |  <td>2</td><td>1</td><td>R&amp;B &#38; more</td><td>5 &lt; 7</td></tr>
      |<tr><td></td><td></td><td></td><td></td><td></td><td></td></tr>
      |<tr><td>2026-01-17</td><td>Caf&#233; United</td>
      |  <td>0</td><td>0</td><td>A&nbsp;B</td><td>&amp;lt;raw&amp;gt;</td></tr>
      |</tbody>
      |</table>
      |-->
      |</div></body></html>""".stripMargin

  test("entity decoding: numeric refs become CHARACTERS, &amp; decodes last") {
    val df = Seq(
      ("O&#39;Brien", "O'Brien"), // the round-10 bug: decoded to O39Brien
      ("R&amp;B", "R&B"),
      ("&amp;lt;", "&lt;"), // double-escaped: decode ONE level only
      ("&#38;#39;", "&#39;"), // numeric double-escape never double-decodes
      ("a&#33;b&#63;", "a!b?"), // multiple refs in one cell
      ("&#233;", "&#233;"), // non-ASCII ref passes through intact
      ("5 &lt; 7 &gt; 3", "5 < 7 > 3"),
      ("say &quot;hi&quot;", "say \"hi\""),
      ("plain", "plain"))
      .toDF("in", "want")
    val got = df.select(HtmlTables.htmlUnescape(col("in")).as("got"),
      col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}' want '${r.getString(1)}'"))
  }

  test("parseTable: commented-out FBref table, entities, separator, dup headers") {
    val pages = Seq((7L, fbrefPage)).toDF("page_id", "page")
    // tableIdx 1: the nav table is #0; the commented-out matchlog is
    // visible to the regex because uncomment() strips markers first
    val wide = HtmlTables.parseTable(pages, "page",
      keyCols = Seq("page_id"), tableIdx = 1)
    assert(wide.columns.toSeq ==
      Seq("page_id", "Date", "Opponent", "GF", "GA", "Notes", "Notes_1"))
    val rows = wide.orderBy("Date").collect()
    assert(rows.length == 3) // 2 data rows + the separator row
    val r1 = rows.filter(_.getAs[String]("Date") == "2026-01-10").head
    assert(r1.getAs[String]("Opponent") == "O'Brien FC") // inner <a> stripped
    assert(r1.getAs[String]("Notes") == "R&B & more")
    assert(r1.getAs[String]("Notes_1") == "5 < 7")
    val r2 = rows.filter(_.getAs[String]("Date") == "2026-01-17").head
    assert(r2.getAs[String]("Opponent") == "Caf&#233; United") // intact
    assert(r2.getAs[String]("Notes") == "A B") // &nbsp;
    assert(r2.getAs[String]("Notes_1") == "&lt;raw&gt;") // one decode level
    // separator row: every cell null (the pd.read_html NaN convention)
    val sep = rows.filter(_.isNullAt(1)).head
    assert((1 until sep.length).forall(sep.isNullAt))
  }

  test("end-to-end S4 chain: parseTable → resolveColumns → cleanMatchlog") {
    val pages = Seq((1L, fbrefPage)).toDF("page_id", "page")
    val wide = HtmlTables.parseTable(pages, "page",
      keyCols = Seq("page_id"), tableIdx = 1)
    // drifted-header resolution + separator-row drop, exactly the S4
    // matchlog scan semantics (Ingest.cleanMatchlog)
    val clean = Ingest.cleanMatchlog(wide,
      Seq("date" -> "date", "opponent" -> "oppo", "gf" -> "gf"))
    val got = clean.orderBy("date").collect()
    assert(got.length == 2) // separator row dropped by na.drop(date)
    assert(got.map(_.getAs[String]("opponent")).toSeq ==
      Seq("O'Brien FC", "Caf&#233; United"))
    assert(got.map(_.getAs[String]("gf")).toSeq == Seq("2", "0"))
  }

  test("visibleText: WET-style page text — chrome dropped, entities decoded") {
    val page = """<html><head><title>T&amp;T</title>
      |<script type="text/javascript">var x = 1 < 2 && "</p>";</script>
      |<style>p { color: red }</style></head>
      |<body><!-- commented <p>chrome</p> stays hidden -->
      |<h1>Head&#33;</h1>
      |<p>body   text
      |with&nbsp;breaks &#8212; and a tail</p></body></html>""".stripMargin
    val got = Seq(Tuple1(page)).toDF("page")
      .select(graft.sources.HtmlTables.visibleText(col("page")))
      .collect()(0).getString(0)
    // title is visible text (WET keeps it); script/style/comment content
    // is NOT; whitespace collapses; &#33; decodes, &#8212; passes intact
    assert(got == "T&T Head! body text with breaks &#8212; and a tail", got)
  }

  test("parseTable: no such table index throws plan-time, not task-time") {
    val pages = Seq((1L, "<html>no tables</html>")).toDF("page_id", "page")
    intercept[IllegalArgumentException] {
      HtmlTables.parseTable(pages, "page", keyCols = Seq("page_id"))
    }
  }

  test("tableCells long form: header and data rows alike, zero UDFs") {
    val pages = Seq((1L, fbrefPage)).toDF("page_id", "page")
    val long = HtmlTables.tableCells(pages, "page",
      keyCols = Seq("page_id"), tableIdx = 0)
    val rows = long.orderBy("row_idx").collect()
    assert(rows.length == 2) // nav table: header + one data row
    assert(rows(0).getSeq[String](2) == Seq("ignore"))
    assert(rows(1).getSeq[String](2) == Seq("menu"))
    // pure column expressions: the plan contains no UDF nodes
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), plan.take(400))
  }
}
