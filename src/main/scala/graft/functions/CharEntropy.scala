package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Shannon entropy (bits/char) over a string's code-point
  * distribution — the classic cheap gibberish/boilerplate signal for
  * pre-training corpora: binary spill, base64 blobs, and key-mash rows
  * sit far from natural language's ~3.5–4.5 bits/char band, and
  * single-character repetition pins to 0. Used alongside the stopword/
  * length quality score (`text_quality`) which cannot see these
  * failure modes (a base64 blob has "good" length and cleanliness).
  *
  * A per-row scalar — no shuffle, no state, scales with the scan and
  * stays inside WholeStageCodegen via a static kernel call. The
  * declarative formulation (explode per character → groupBy(doc_id,
  * char) → entropy aggregate) shuffles one row per CHARACTER — ~10³×
  * the document count at corpus scale — to compute what is a pure
  * function of the row; the DuckDB oracle replays exactly that
  * formulation, so the kernel's fold is value-pinned cross-engine.
  *
  * Semantics (mirrored by the oracle): distribution over Unicode code
  * points (not UTF-16 units — "é" is one symbol, as in DuckDB's
  * character split); entropy = −Σ p·log₂p; the empty string is defined
  * as 0.0 bits (DuckDB's `string_split('', '')` yields one empty
  * element — one symbol, zero entropy — and a length-0 distribution
  * has no information either way); NULL in → NULL out.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects STRING, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  def apply(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))

  private val Ln2 = math.log(2.0)

  /** Static kernel shared by eval and generated code: one pass to
    * count code points (dense array for ASCII — the overwhelmingly
    * common case — boxed map only when a row actually contains
    * non-ASCII), one pass over the ≤ |alphabet| counters to fold the
    * entropy. O(len) time, O(alphabet) space per row. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var n = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a, b) => Integer.valueOf(a.intValue() + b.intValue()))
      }
      n += 1
      i += Character.charCount(cp)
    }
    // fold as Σ p·log₂(1/p): every term is ≥ 0, so a one-symbol row
    // lands on +0.0 exactly — the algebraically equal −Σ p·log₂p form
    // yields −0.0 in engines that negate the sum (the oracle SQL uses
    // the same positive-term form for the identical reason)
    val nd = n.toDouble
    var h = 0.0
    var k = 0
    while (k < 128) {
      val c = ascii(k)
      if (c > 0) h += (c / nd) * (math.log(nd / c) / Ln2)
      k += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        h += (c / nd) * (math.log(nd / c) / Ln2)
      }
    }
    h
  }
}
