package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
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

/** Aho–Corasick dictionary automaton (the classic 1975 construction):
  * goto trie + BFS failure links + merged output sets, so ONE pass over
  * the text reports every dictionary term it contains — O(|text|)
  * regardless of dictionary size, where the naive form pays one
  * substring scan PER term and a regex alternation backtracks. The
  * dictionary-tagging primitive of corpus curation: topic taxonomies,
  * blocklist terms, PII trigger words — dictionaries run to 10^4–10^6
  * terms at 100 TB, which is exactly where per-term scans stop scaling.
  */
object AhoCorasick {

  final class Node {
    val next = new java.util.HashMap[Character, Node]()
    var fail: Node = _
    /** Dictionary indices whose term ends at this node (own + inherited
      * through fail links, merged at build so match time never chases
      * the fail chain).
      */
    var out: Array[Int] = Array.emptyIntArray
  }

  /** Build the automaton; `dict` terms must be non-empty. */
  def build(dict: Seq[String]): Node = {
    val root = new Node
    dict.zipWithIndex.foreach { case (w, i) =>
      require(w.nonEmpty, "empty dictionary term")
      var cur = root
      w.foreach { ch =>
        var nxt = cur.next.get(ch)
        if (nxt == null) { nxt = new Node; cur.next.put(ch, nxt) }
        cur = nxt
      }
      cur.out = cur.out :+ i
    }
    // BFS failure links; outputs merge parent-of-fail so matching is a
    // single state walk
    val queue = new java.util.ArrayDeque[Node]()
    root.fail = root
    root.next.values.forEach { n => n.fail = root; queue.add(n) }
    while (!queue.isEmpty) {
      val cur = queue.poll()
      cur.next.forEach { (ch, child) =>
        // resolve: deepest proper suffix state with a ch-transition
        var g = cur.fail
        var resolved: Node = null
        var done = false
        while (!done) {
          val t = g.next.get(ch)
          if (t != null && (t ne child)) { resolved = t; done = true }
          else if (g eq root) { resolved = root; done = true }
          else g = g.fail
        }
        child.fail = resolved
        if (resolved.out.nonEmpty) child.out = child.out ++ resolved.out
        queue.add(child)
      }
    }
    root
  }

  /** Walk `text` once; returns the set of matched dictionary indices. */
  def matchedIndices(root: Node, text: String): java.util.BitSet = {
    val bits = new java.util.BitSet()
    var cur = root
    var i = 0
    while (i < text.length) {
      val ch = Character.valueOf(text.charAt(i))
      var t = cur.next.get(ch)
      while (t == null && (cur ne root)) {
        cur = cur.fail
        t = cur.next.get(ch)
      }
      cur = if (t != null) t else root
      val out = cur.out
      var j = 0
      while (j < out.length) { bits.set(out(j)); j += 1 }
      i += 1
    }
    bits
  }
}

/** `multi_match(text)` — the dictionary terms contained in `text` as an
  * array in DICTIONARY order (substring semantics, case-sensitive; the
  * caller lowercases both sides for case-folded tagging). One
  * Aho-Corasick pass per row; the automaton builds once per task
  * (@transient lazy), the expression serializes only the term list.
  */
case class MultiMatch(child: Expression, dict: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dict.nonEmpty &&
        dict.forall(_.nonEmpty))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "multi_match expects a STRING column and a non-empty dictionary " +
          "of non-empty terms")

  @transient private lazy val automaton = AhoCorasick.build(dict)
  @transient private lazy val terms =
    dict.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val bits = AhoCorasick.matchedIndices(automaton, input.toString)
    val out = new Array[Any](bits.cardinality())
    var i = bits.nextSetBit(0); var k = 0
    while (i >= 0) {
      out(k) = terms(i); k += 1
      i = bits.nextSetBit(i + 1)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def prettyName: String = "multi_match"

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatch = copy(child = newChild)
}

/** `nfc_normalize(text)` — Unicode NFC canonical composition (the
  * Unicode-spec normal form, so JDK `java.text.Normalizer` and DuckDB's
  * utf8proc agree byte-for-byte): the canonicalization pass a text
  * corpus needs BEFORE exact dedup / fingerprinting — 'café' composed
  * and 'café' decomposed (e + U+0301) are different byte strings with
  * identical rendering, and an un-normalized digest treats them as
  * distinct documents.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(input.toString,
        java.text.Normalizer.Form.NFC))

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** SQL registration: `nfc_normalize(text)`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => children match {
      case Seq(t) => NfcNormalize(t)
      case _ => throw new IllegalArgumentException("nfc_normalize(text)")
    })
}

object MultiMatch {
  def apply(text: Column, dict: Seq[String]): Column =
    ColumnBridge.column(MultiMatch(ColumnBridge.expression(text), dict))

  /** SQL registration: `multi_match(text, 'term1,term2,...')` — the
    * dictionary as one comma-joined string LITERAL (an automaton needs
    * plan-time terms).
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("multi_match"),
    new ExpressionInfo(classOf[MultiMatch].getName, "multi_match"),
    (children: Seq[Expression]) => children match {
      case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(d, StringType)) =>
        MultiMatch(t, d.toString.split(',').toSeq)
      case _ => throw new IllegalArgumentException(
        "multi_match(text, 'term1,term2,...')")
    })
}
