package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense dot product over two ARRAY<FLOAT> columns.
  *
  * The built-in higher-order route — aggregate(zip_with(a, b, _*_), …) —
  * is evaluated interpreted (HOFs are CodegenFallback), allocating an
  * intermediate array per row; on an all-pairs similarity join that is
  * the hot path. This expression compiles to a tight primitive loop
  * inside WholeStageCodegen: no allocation, no boxing.
  *
  * Semantics match the interpreted/oracle formulation exactly: each float
  * is widened to double, products accumulate sequentially left-to-right;
  * null input array → null; arrays of UNEQUAL length → null (zip_with
  * pads the shorter with nulls, so the padded products poison the sum);
  * any null ELEMENT → null (null product poisons the accumulating add).
  * This exactness is what lets [[graft.plans.RewriteDotProduct]] fire
  * unconditionally.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null even for non-null inputs: ragged lengths / null elements
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_float expects two ARRAY<FLOAT> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // the null checks stay out of the hot path's way: length mismatch
      // branches once per row, isNullAt is a bit test the JIT hoists for
      // arrays whose null bitmap is absent
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFloat(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
