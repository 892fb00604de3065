package graft.queries

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

/** K5 chart sink — dependency-free SVG renderers over the [[Reports]]
  * aggregates, closing the reference's chart outputs
  * (`examples/visualize_data.py:59-314`: fixtures-by-league bar,
  * fixtures timeline line, top-team win-ratio bar, goals
  * scored-vs-conceded scatter, match-quality heatmap) without
  * matplotlib or any image library.
  *
  * Rendering is DETERMINISTIC BY CONSTRUCTION: all numbers are printed
  * with fixed Locale.ROOT formats, there are no timestamps or random
  * ids, and input order is preserved — so the same aggregate rows
  * produce byte-identical SVG on any run, JVM, or partitioning
  * (golden-file testable, content-addressable, diffable in review).
  *
  * The engine boundary stays the K5 contract: charts render DRIVER-side
  * from SMALL aggregates via [[Reports.chartData]]'s guarded collect —
  * an unaggregated frame cannot flood the driver, and nothing here runs
  * on executors.
  */
object Charts {

  private val W = 960
  private val H = 540
  private val ML = 70; private val MR = 30
  private val MT = 50; private val MB = 90

  private def f2(d: Double): String = "%.2f".formatLocal(Locale.ROOT, d)
  private def f1(d: Double): String = "%.1f".formatLocal(Locale.ROOT, d)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Linear RGB ramp between two colors, t in [0,1]. */
  private def ramp(t: Double, lo: (Int, Int, Int),
                   hi: (Int, Int, Int)): String = {
    val tt = math.max(0.0, math.min(1.0, t))
    def mix(a: Int, b: Int) = (a + (b - a) * tt).round.toInt
    "#%02x%02x%02x".formatLocal(Locale.ROOT,
      mix(lo._1, hi._1), mix(lo._2, hi._2), mix(lo._3, hi._3))
  }

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H" font-family="sans-serif">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="28" font-size="18" font-weight="bold" text-anchor="middle">${esc(title)}</text>
       |""".stripMargin

  private def axes(xLabel: String, yLabel: String): String =
    s"""<line x1="$ML" y1="${H - MB}" x2="${W - MR}" y2="${H - MB}" stroke="black"/>
       |<line x1="$ML" y1="$MT" x2="$ML" y2="${H - MB}" stroke="black"/>
       |<text x="${(ML + W - MR) / 2}" y="${H - 12}" font-size="12" text-anchor="middle">${esc(xLabel)}</text>
       |<text x="18" y="${(MT + H - MB) / 2}" font-size="12" text-anchor="middle" transform="rotate(-90 18 ${(MT + H - MB) / 2})">${esc(yLabel)}</text>
       |""".stripMargin

  /** Y-axis ticks at 5 even positions over [0, yMax]. */
  private def yTicks(yMax: Double): String = {
    val sb = new StringBuilder
    for (i <- 0 to 4) {
      val v = yMax * i / 4
      val y = H - MB - (H - MB - MT) * i / 4.0
      sb.append(s"""<line x1="${ML - 4}" y1="${f1(y)}" x2="$ML" y2="${f1(y)}" stroke="black"/>""")
        .append(s"""<text x="${ML - 8}" y="${f1(y + 4)}" font-size="10" text-anchor="end">${f2(v)}</text>""")
        .append('\n')
    }
    sb.toString
  }

  /** Vertical bar chart with value annotations above each bar —
    * `visualize_fixtures_by_league` / `team_win_ratios` shape.
    */
  def barChart(title: String, xLabel: String, yLabel: String,
               bars: Seq[(String, Double)],
               barColor: String = "#87ceeb",
               valueFmt: Double => String = d => f2(d)): String = {
    val yMax = math.max(bars.map(_._2).foldLeft(0.0)(math.max), 1e-9)
    val plotW = W - ML - MR; val plotH = H - MB - MT
    val n = math.max(bars.size, 1)
    val slot = plotW.toDouble / n
    val bw = slot * 0.7
    val sb = new StringBuilder(header(title))
    sb.append(axes(xLabel, yLabel)).append(yTicks(yMax))
    bars.zipWithIndex.foreach { case ((label, v), i) =>
      val x = ML + slot * i + (slot - bw) / 2
      val h = plotH * v / yMax
      val y = H - MB - h
      val cx = ML + slot * i + slot / 2
      sb.append(s"""<rect x="${f1(x)}" y="${f1(y)}" width="${f1(bw)}" height="${f1(h)}" fill="$barColor"/>""")
        .append(s"""<text x="${f1(cx)}" y="${f1(y - 5)}" font-size="10" font-weight="bold" text-anchor="middle">${esc(valueFmt(v))}</text>""")
        .append(s"""<text x="${f1(cx)}" y="${H - MB + 12}" font-size="10" text-anchor="end" transform="rotate(-45 ${f1(cx)} ${H - MB + 12})">${esc(label)}</text>""")
        .append('\n')
    }
    sb.append("</svg>\n").toString
  }

  /** Line chart with circle markers and per-point labels —
    * `visualize_fixtures_timeline` shape.
    */
  def lineChart(title: String, xLabel: String, yLabel: String,
                points: Seq[(String, Double)],
                lineColor: String = "#2e8b57"): String = {
    val yMax = math.max(points.map(_._2).foldLeft(0.0)(math.max), 1e-9)
    val plotW = W - ML - MR; val plotH = H - MB - MT
    val n = math.max(points.size, 1)
    def px(i: Int) =
      if (n == 1) ML + plotW / 2.0 else ML + plotW.toDouble * i / (n - 1)
    def py(v: Double) = H - MB - plotH * v / yMax
    val sb = new StringBuilder(header(title))
    sb.append(axes(xLabel, yLabel)).append(yTicks(yMax))
    // dashed grid like the reference's grid(linestyle='--')
    for (i <- 1 to 4) {
      val y = H - MB - plotH * i / 4.0
      sb.append(s"""<line x1="$ML" y1="${f1(y)}" x2="${W - MR}" y2="${f1(y)}" stroke="#cccccc" stroke-dasharray="4 3"/>""")
        .append('\n')
    }
    if (points.size > 1) {
      val path = points.zipWithIndex.map { case ((_, v), i) =>
        s"${f1(px(i))},${f1(py(v))}"
      }.mkString(" ")
      sb.append(s"""<polyline points="$path" fill="none" stroke="$lineColor" stroke-width="2"/>""")
        .append('\n')
    }
    points.zipWithIndex.foreach { case ((label, v), i) =>
      sb.append(s"""<circle cx="${f1(px(i))}" cy="${f1(py(v))}" r="4" fill="$lineColor"/>""")
        .append(s"""<text x="${f1(px(i))}" y="${f1(py(v) - 8)}" font-size="10" font-weight="bold" text-anchor="middle">${esc(f1(v))}</text>""")
        .append(s"""<text x="${f1(px(i))}" y="${H - MB + 12}" font-size="9" text-anchor="end" transform="rotate(-45 ${f1(px(i))} ${H - MB + 12})">${esc(label)}</text>""")
        .append('\n')
    }
    sb.append("</svg>\n").toString
  }

  /** One scatter point: bubble size ~ `size` in [0,1], bubble color ~
    * `color` in [0,1] on a blue→red (coolwarm-style) ramp.
    */
  final case class ScatterPoint(label: String, x: Double, y: Double,
                                size: Double, color: Double)

  /** Labeled bubble scatter with y=x diagonal — the goals
    * scored-vs-conceded analysis shape (`team_goals_analysis`).
    * `legend` is caller-supplied (empty = no caption) — the renderer is
    * generic; the football caption lives in [[goalsScatterSvg]].
    */
  def scatterChart(title: String, xLabel: String, yLabel: String,
                   pts: Seq[ScatterPoint], legend: String = ""): String = {
    val xMax = math.max(pts.map(_.x).foldLeft(0.0)(math.max), 1e-9) + 0.5
    val yMax = math.max(pts.map(_.y).foldLeft(0.0)(math.max), 1e-9) + 0.5
    val m = math.max(xMax, yMax)
    val plotW = W - ML - MR; val plotH = H - MB - MT
    def px(v: Double) = ML + plotW * v / m
    def py(v: Double) = H - MB - plotH * v / m
    val sb = new StringBuilder(header(title))
    sb.append(axes(xLabel, yLabel)).append(yTicks(m))
    // x ticks mirror the y ticks (shared scale keeps the diagonal honest)
    for (i <- 0 to 4) {
      val v = m * i / 4
      sb.append(s"""<line x1="${f1(px(v))}" y1="${H - MB}" x2="${f1(px(v))}" y2="${H - MB + 4}" stroke="black"/>""")
        .append(s"""<text x="${f1(px(v))}" y="${H - MB + 16}" font-size="10" text-anchor="middle">${f2(v)}</text>""")
        .append('\n')
    }
    sb.append(s"""<line x1="${f1(px(0))}" y1="${f1(py(0))}" x2="${f1(px(m))}" y2="${f1(py(m))}" stroke="black" stroke-dasharray="6 4" opacity="0.3"/>""")
      .append('\n')
    pts.foreach { p =>
      val r = 4 + 16 * math.max(0.0, math.min(1.0, p.size))
      val c = ramp(p.color, (59, 76, 192), (180, 4, 38))
      sb.append(s"""<circle cx="${f1(px(p.x))}" cy="${f1(py(p.y))}" r="${f1(r)}" fill="$c" opacity="0.7"/>""")
        .append(s"""<text x="${f1(px(p.x))}" y="${f1(py(p.y) - r - 3)}" font-size="9" text-anchor="middle">${esc(p.label)}</text>""")
        .append('\n')
    }
    if (legend.nonEmpty)
      sb.append(s"""<text x="${ML + 8}" y="${H - MB - 8}" font-size="10">${esc(legend)}</text>""")
        .append('\n')
    sb.append("</svg>\n").toString
  }

  /** Annotated heatmap on a white→orange→red (YlOrRd-style) ramp —
    * `match_quality_heatmap` shape. `cell` None renders an empty cell.
    */
  def heatmap(title: String, xLabel: String, yLabel: String,
              rowKeys: Seq[String], colKeys: Seq[String],
              cell: (String, String) => Option[Double]): String = {
    val vals = for { r <- rowKeys; c <- colKeys; v <- cell(r, c) } yield v
    val vMin = vals.foldLeft(Double.MaxValue)(math.min)
    val vMax = vals.foldLeft(Double.MinValue)(math.max)
    val span = if (vals.isEmpty || vMax == vMin) 1.0 else vMax - vMin
    val plotW = W - ML - MR; val plotH = H - MB - MT
    val cw = plotW.toDouble / math.max(colKeys.size, 1)
    val ch = plotH.toDouble / math.max(rowKeys.size, 1)
    val sb = new StringBuilder(header(title))
    sb.append(s"""<text x="${(ML + W - MR) / 2}" y="${H - 12}" font-size="12" text-anchor="middle">${esc(xLabel)}</text>""")
      .append(s"""<text x="18" y="${(MT + H - MB) / 2}" font-size="12" text-anchor="middle" transform="rotate(-90 18 ${(MT + H - MB) / 2})">${esc(yLabel)}</text>""")
      .append('\n')
    rowKeys.zipWithIndex.foreach { case (rk, ri) =>
      val y = MT + ch * ri
      sb.append(s"""<text x="${ML - 6}" y="${f1(y + ch / 2 + 3)}" font-size="9" text-anchor="end">${esc(rk)}</text>""")
        .append('\n')
      colKeys.zipWithIndex.foreach { case (ck, ci) =>
        val x = ML + cw * ci
        cell(rk, ck) match {
          case Some(v) =>
            val t = if (vals.size <= 1) 0.5 else (v - vMin) / span
            // two-stop YlOrRd: light yellow → red through orange
            val c =
              if (t < 0.5) ramp(t * 2, (255, 255, 204), (254, 153, 41))
              else ramp(t * 2 - 1, (254, 153, 41), (189, 0, 38))
            val textC = if (t > 0.6) "white" else "black"
            sb.append(s"""<rect x="${f1(x)}" y="${f1(y)}" width="${f1(cw)}" height="${f1(ch)}" fill="$c" stroke="white" stroke-width="0.5"/>""")
              .append(s"""<text x="${f1(x + cw / 2)}" y="${f1(y + ch / 2 + 3)}" font-size="9" text-anchor="middle" fill="$textC">${f2(v)}</text>""")
              .append('\n')
          case None =>
            sb.append(s"""<rect x="${f1(x)}" y="${f1(y)}" width="${f1(cw)}" height="${f1(ch)}" fill="#f0f0f0" stroke="white" stroke-width="0.5"/>""")
              .append('\n')
        }
      }
    }
    colKeys.zipWithIndex.foreach { case (ck, ci) =>
      val x = ML + cw * ci + cw / 2
      sb.append(s"""<text x="${f1(x)}" y="${H - MB + 12}" font-size="9" text-anchor="end" transform="rotate(-45 ${f1(x)} ${H - MB + 12})">${esc(ck)}</text>""")
        .append('\n')
    }
    sb.append("</svg>\n").toString
  }

  // ------------------------------------------------ DataFrame boundary

  /** Rows → chart via the guarded K5 collect. The caller's frame must
    * already be the SMALL ordered aggregate (the [[Reports]] queries).
    */
  private def collected(df: DataFrame): Seq[Row] =
    Reports.chartData(df).toSeq

  // lenient accessors: label columns may be string/date/timestamp,
  // numeric columns int/long/double/decimal — all with deterministic
  // renderings, so byte stability is preserved
  private def str(r: Row, i: Int): String =
    Option(r.get(i)).map(_.toString).getOrElse("")
  private def num(r: Row, i: Int): Double = r.get(i) match {
    case null => 0.0
    case n: java.lang.Number => n.doubleValue()
    case d: java.math.BigDecimal => d.doubleValue()
    case v => v.toString.toDouble
  }

  /** `fixtures_by_league` bar: input (league, count) ordered frame. */
  def fixturesByLeagueSvg(counts: DataFrame): String =
    barChart("Upcoming Fixtures by League", "League", "Number of Fixtures",
      collected(counts).map(r => str(r, 0) -> num(r, 1)),
      valueFmt = v => v.toLong.toString)

  /** `fixtures_timeline` line: input (date-string, count) ordered frame. */
  def fixturesTimelineSvg(byDate: DataFrame): String =
    lineChart("Upcoming Fixtures Timeline", "Date", "Number of Fixtures",
      collected(byDate).map(r => str(r, 0) -> num(r, 1)))

  /** `team_win_ratios` bar: input (team, win_ratio) ordered frame,
    * percentage annotations like the reference.
    */
  def winRatioSvg(topTeams: DataFrame): String =
    barChart("Top Teams by Win Ratio", "Team", "Win Ratio",
      collected(topTeams).map(r => str(r, 0) -> num(r, 1)),
      barColor = "#4682b4",
      valueFmt = v => f1(v * 100) + "%")

  /** `team_goals_analysis` scatter: input
    * (team, avg_goals_for, avg_goals_against, win_ratio, shot_accuracy).
    */
  def goalsScatterSvg(teamMetrics: DataFrame): String =
    scatterChart("Team Performance: Goals Scored vs. Goals Conceded",
      "Average Goals Scored per Match", "Average Goals Conceded per Match",
      collected(teamMetrics).map(r => ScatterPoint(str(r, 0),
        num(r, 1), num(r, 2), num(r, 3), num(r, 4))),
      legend = "Bubble size: win ratio; color: shot accuracy; " +
        "below diagonal: positive goal difference")

  /** `match_quality_heatmap`: input (home_team, away_team, quality). */
  def qualityHeatmapSvg(quality: DataFrame): String = {
    val rows = collected(quality)
      .map(r => (str(r, 0), str(r, 1), num(r, 2)))
    val homes = rows.map(_._1).distinct.sorted
    val aways = rows.map(_._2).distinct.sorted
    val byCell = rows.map(t => (t._1, t._2) -> t._3).toMap
    heatmap("Upcoming Fixtures: Match Quality Heatmap", "Away Team",
      "Home Team", homes, aways, (h, a) => byCell.get((h, a)))
  }

  /** Write an SVG next to the other K sinks (driver-side, tiny file). */
  def save(svg: String, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
