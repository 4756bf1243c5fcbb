package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, registerFunction}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * allocates an intermediate array and evaluates interpreted lambda calls
  * per element; for ANN scoring (one dot per candidate pair) that is the
  * hot path. This expression walks both ArrayData buffers directly and
  * participates in whole-stage codegen — the preference-order (b) custom
  * scalar from the build brief: a Catalyst `Expression` with `doGenCode`,
  * not a UDF.
  *
  * Null semantics: null if either array is null; null array *elements*
  * contribute 0 (matches `zip_with` multiply-by-null → null dropped by our
  * callers' non-null quantized inputs; documented rather than load-bearing).
  * Arrays of different lengths dot over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        acc += xs.getDouble(i) * ys.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$xs.isNullAt($i) && !$ys.isNullAt($i)) {
         |    $acc += $xs.getDouble($i) * $ys.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Column API: dot product of two array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    exprToColumn(DotProduct(colToExpr(a), colToExpr(b)))

  /** Cosine similarity from precomputed squared norms:
    * dot(a,b)/sqrt(na·nb). Exact when inputs are integer-quantized.
    */
  def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot_product(a, b) / sqrt(na * nb)
  }

  /** SQL registration so `dot_product` is usable from spark.sql(...). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registerFunction(spark, "dot_product", exprs => DotProduct(exprs(0), exprs(1)))
}
