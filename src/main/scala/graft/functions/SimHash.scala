package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass 32-bit simhash over a token array, inside WholeStageCodegen.
  *
  * The declarative formulation (explode tokens → md5 → 32 conditional
  * sums → groupBy(doc_id)) shuffles ONE ROW PER TOKEN and re-assembles
  * each document in a 32-buffer HashAggregate — at corpus scale the
  * exchange carries ~100× the document count. But simhash needs no
  * cross-row state at all: every document's fingerprint is a pure
  * function of its own token array. This kernel computes it row-local —
  * simhash becomes a narrow projection at scan parallelism, and the only
  * shuffle left in the dedup pipeline is the banded pair join itself.
  *
  * Bit semantics are IDENTICAL to the aggregate formulation (and the
  * DuckDB oracle, which replays it): per token, hex digit k ∈ [1,8] of
  * md5(token), bit b ∈ [0,3]; counter i = (k−1)·4+b accumulates +1 if
  * (digit >> b) & 1 else −1 (a NULL token falls to the −1 branch on all
  * 32 counters, mirroring `when(null).otherwise(-1)`); fingerprint bit i
  * is set iff counter i > 0. Empty array → NULL (explode emits no rows,
  * so the aggregate never saw the doc); LlmOpsSpec pins kernel ≡
  * aggregate on real and adversarial docs.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // null for the empty token array even when the input is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() == 0) null else SimHash32Kernel.compute(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // one static call per row: the MD5 loop lives in the kernel (a
      // ThreadLocal digest, no per-row allocation beyond the digest's
      // own output buffer), and the surrounding operators stay fused
      s"""
         |if ($x.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHash32Kernel.compute($x);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))
}

/** Row-local simhash fold, called from both the interpreted eval and the
  * generated code (Scala top-level objects expose static forwarders, so
  * codegen references it without reflection). */
object SimHash32Kernel {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(a: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = a.numElements()
    var t = 0
    while (t < n) {
      if (a.isNullAt(t)) {
        // SQL mirror: a null token's digit test is null → otherwise(-1)
        var i = 0
        while (i < 32) { counts(i) -= 1; i += 1 }
      } else {
        val d = md.get()
        d.reset()
        val dig = d.digest(a.getUTF8String(t).getBytes)
        var i = 0
        while (i < 32) {
          val k0 = i >> 2 // 0-based hex-digit index (first 8 hex chars)
          val byteVal = dig(k0 >> 1) & 0xff
          val digit = if ((k0 & 1) == 0) (byteVal >> 4) & 0xf else byteVal & 0xf
          counts(i) += (if (((digit >> (i & 3)) & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var v = 0L
    var i = 0
    while (i < 32) {
      if (counts(i) > 0) v |= 1L << i
      i += 1
    }
    v
  }
}
