package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd integer dot product over two ARRAY<INT> code columns — the
  * scoring kernel of SQ8 (scalar-quantized) similarity search. The
  * exploded alternative (one row per (vector, dimension), join on dim,
  * hash-aggregate the products) multiplies the corpus row count by the
  * dimensionality; this expression keeps one row per vector and runs the
  * 64-element loop inside WholeStageCodegen — no join, no agg, no
  * allocation.
  *
  * Same null discipline as [[DotProductFloat]]: null array → null,
  * unequal lengths → null, any null element → null. Products accumulate
  * in Long, so 64 products of zero-centered int8 codes (|v| ≤ 128²·64)
  * can never overflow.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_int expects two ARRAY<INT> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $x.getInt($i) * (long) $y.getInt($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Codegen'd asymmetric-distance lookup-sum — the scoring kernel of PQ
  * (product-quantization) search: Σ_i table[i][codes[i]], where `codes`
  * is a vector's ARRAY<INT> of per-subspace centroid ids and `table` a
  * query's ARRAY<ARRAY<LONG>> distance table (subspace-major). One
  * corpus row is scored with |codes| array reads — the corpus is never
  * decompressed and never exploded.
  *
  * Null/shape discipline: null input → null; |codes| ≠ |table| → null;
  * null element, null sub-table, or a code outside its sub-table's
  * bounds → null (a malformed code must poison the score, not read
  * garbage).
  */
case class CodeLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"code_lookup_sum expects (ARRAY<INT>, ARRAY<ARRAY<BIGINT>>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != table.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || table.isNullAt(i)) return null
      val c = codes.getInt(i)
      val row = table.getArray(i)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getLong(c)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $codes.numElements();
         |if ($n != $table.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($codes.isNullAt($i) || $table.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $c = $codes.getInt($i);
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $table.getArray($i);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $row.getLong($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CodeLookupSum {
  def apply(codes: Column, table: Column): Column =
    ColumnBridge.column(CodeLookupSum(ColumnBridge.expression(codes), ColumnBridge.expression(table)))
}
