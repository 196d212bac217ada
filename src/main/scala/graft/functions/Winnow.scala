package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local winnowing (MOSS fingerprinting): the distinct
  * sliding-window minima of the 60-bit k-gram hashes of one document,
  * as an ARRAY<LONG>, inside WholeStageCodegen.
  *
  * The declarative formulation (explode one row per character position →
  * md5 each k-gram → window min over (doc_id, pos) → distinct) shuffles
  * up to 8,192 rows PER DOCUMENT through a window sort to compute what
  * is a pure function of the document's own text — the same
  * never-cross-row argument as [[SimHash32]] and the row-local shingle
  * index. This kernel folds it in one pass: per-position hash, O(n)
  * monotonic-deque sliding min, distinct in first-occurrence order.
  *
  * Bit semantics are IDENTICAL to the window rendition (LlmOpsSpec
  * gates them): position p ∈ [1, len−k+1] hashes
  * `substring(text, p, k)` exactly as `PortableHash.hash60` (first 15
  * hex nibbles of md5 as a non-negative long); a fingerprint exists
  * only for FULL windows (p ≤ ngrams − w + 1, mirroring the
  * `pos <= ngrams - (W-1)` filter); duplicates within a doc collapse
  * (mirroring the per-doc distinct). Texts shorter than k+w−1 chars
  * return an empty array — callers keep the explicit length filter for
  * row-parity with the staged artifact.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    WinnowKernel.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WinnowKernel.compute($x, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}

/** One-pass winnowing fold shared by interpreted eval and codegen. */
object WinnowKernel {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(bytes) as a non-negative long —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`. */
  private def hash60(d: java.security.MessageDigest, s: UTF8String): Long = {
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var j = 0
    while (j < 15) {
      val b = dig(j >> 1) & 0xff
      val nibble = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nibble
      j += 1
    }
    v
  }

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val nChars = text.numChars()
    val ngrams = nChars - (k - 1)
    val nWins = ngrams - (w - 1)
    if (nWins <= 0) return new GenericArrayData(Array.empty[Long])
    val d = md.get()
    val hs = new Array[Long](ngrams)
    var p = 0
    while (p < ngrams) {
      hs(p) = hash60(d, text.substringSQL(p + 1, k))
      p += 1
    }
    // monotonic deque: indices of increasing hash values in the window
    val deque = new Array[Int](ngrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = Array.newBuilder[Long]
    var i = 0
    while (i < ngrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val fp = hs(deque(head))
        if (seen.add(fp)) out += fp
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
}
