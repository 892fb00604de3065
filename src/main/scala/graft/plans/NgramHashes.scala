package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram hash kernel: the membership-test side of
  * the gram family. Where `Dedup.wordShingles` materializes every gram
  * as a string (concat_ws per gram, array_distinct over strings),
  * this emits only the DISTINCT xxhash64 values of those grams — one
  * compiled call per row, no intermediate gram strings surviving the
  * row. Bit-compatible with `xxhash64(gram)` over the exact
  * `wordShingles` gram construction (same lowercased whitespace
  * tokenization, ' '-joined grams, short-doc single-gram fallback,
  * seed 42 via `XxHash64Function` — the built-in's code path), which is
  * what lets a hash-prefilter pass agree with a string-equality verify
  * pass. `CodegenFallback` for the same reason as `MinHashSig`: the
  * row's work is one bulk compiled loop either way.
  */
object NgramHashKernel {
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = text.toString.toLowerCase.trim
      .split("\\s+").filter(_.nonEmpty)
    val grams: Iterator[String] =
      if (toks.length >= n)
        (0 to toks.length - n).iterator
          .map(i => toks.slice(i, i + n).mkString(" "))
      else Iterator.single(toks.mkString(" "))
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    grams.foreach { g =>
      seen.add(XxHash64Function.hash(UTF8String.fromString(g), StringType, 42L))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

case class NgramHashes(child: Expression, nGram: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      NgramHashKernel.hashes(input.asInstanceOf[UTF8String], nGram))

  override def prettyName: String = "ngram_hashes"

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  /** Column-API wrapper (no SQL registration needed). */
  def apply(text: Column, nGram: Int): Column =
    ColumnBridge.column(
      NgramHashes(ColumnBridge.expression(text), nGram))

  /** SQL registration payload: `ngram_hashes(text[, n])`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_hashes"),
    new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
    (children: Seq[Expression]) => {
      def intArg(e: Expression, default: Int): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case _ => default
      }
      children match {
        case Seq(c) => NgramHashes(c, 3)
        case Seq(c, n) => NgramHashes(c, intArg(n, 3))
        case _ => throw new IllegalArgumentException("ngram_hashes(text[, n])")
      }
    })
}
