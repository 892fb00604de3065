package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native string-similarity kernels for the entity-resolution family —
  * the record-linkage counterpart of the reference's alias-table lookup
  * (`utils/team_utils.py` resolves known name variants by dictionary;
  * this scores UNKNOWN variants so the dictionary can be built).
  *
  * Jaro–Winkler is implemented to be BIT-compatible with DuckDB's
  * `jaro_winkler_similarity` so registry oracles can cross-check it
  * exactly (pinned on 5 000 randomized pairs during development, and on
  * every blocked pair of `j36`). The portable semantics, reverse-derived
  * and spec-pinned:
  *
  *  - either side empty → 0.0 (including both-empty);
  *  - match window = max(0, max(|a|,|b|)/2 - 1), integer division;
  *  - greedy left-to-right matching iterating the FIRST argument's
  *    positions (the classic Jaro matching — asymmetric in tie-breaks
  *    but symmetric in result);
  *  - transpositions = floor(mismatched matched positions / 2) as an
  *    INTEGER (textbook implementations keep the half-count fractional;
  *    DuckDB floors it — scores differ by up to ~0.06 on adversarial
  *    pairs, so this is load-bearing for the oracle);
  *  - jaro = (m/|a| + m/|b| + (m - t)/m) / 3, evaluated in exactly that
  *    double operation order;
  *  - Winkler boost only when jaro > 0.7: common prefix capped at 4,
  *    jw = j + l·0.1·(1-j).
  *
  * `CodegenFallback` is deliberate (the `MinHashSig`/`VecOps` posture):
  * the per-row work is a bulk O(|a|·window) primitive loop that runs as
  * compiled Scala either way; codegen granularity is the row.
  *
  * Semantics are over UTF-16 code units (Java chars) — identical to
  * byte/code-point semantics for ASCII keys, which is what blocking keys
  * should be normalized to anyway at 100 TB (mixed-script linkage wants
  * a transliteration pass first, not a fancier window).
  */
object StringKernels {

  /** Jaro similarity, DuckDB-bit-compatible (see object doc). */
  def jaro(a: String, b: String): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!bMatch(k) && b.charAt(k) == a.charAt(i)) {
          aMatch(i) = true; bMatch(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val t = mismatched / 2 // INTEGER floor — the DuckDB divergence point
    val md = matches.toDouble
    (md / n + md / m + (md - t) / md) / 3.0
  }

  /** Jaro–Winkler: prefix boost (≤4 chars, p=0.1) above jaro 0.7. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j > 0.7) {
      val max = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < max && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

/** `jaro_winkler(a, b)` — similarity in [0,1] of two string columns. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two STRING, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringKernels.jaroWinkler(l.toString, r.toString)

  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinklerSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `jaro_winkler(a, b)`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => JaroWinklerSim(a, b)
      case _ => throw new IllegalArgumentException("jaro_winkler(a, b)")
    })
}
