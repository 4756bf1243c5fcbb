package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, registerFunction, AbstractDataType}
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
  * Null semantics MATCH the built-in composition exactly — this is what
  * makes [[RewriteDotProduct]] a semantics-preserving optimizer rule:
  * null if either array is null, if the arrays differ in length (zip_with
  * null-pads the short side, and null×x poisons the sum), or if any
  * element is null. `ExpectsInputTypes` rejects non-array<double> inputs
  * at analysis time instead of a runtime ClassCastException.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  // can produce null from non-null children (length mismatch/null element)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
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
         |int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $xs.getDouble($i) * $ys.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two `array<int>` columns — the PQ
  * assign/LUT hot loop (q121/q122 and the index-serve family): the
  * built-in `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0, _+_)`
  * allocates an intermediate array and runs interpreted lambda calls per
  * element, and higher-order functions do not participate in whole-stage
  * codegen. Null semantics MATCH that composition exactly: null if
  * either array is null, if lengths differ (zip_with null-pads and the
  * null element poisons the sum), or if any element is null. Arithmetic
  * is 32-bit int like the composition (inputs are int8-quantized
  * subvectors, far from overflow), so results are bit-identical.
  */
case class IntSqL2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getInt(i) - ys.getInt(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $xs.numElements();
         |if ($n != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $d = $xs.getInt($i) - $ys.getInt($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqL2 =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Column API: dot product of two array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    exprToColumn(DotProduct(colToExpr(a), colToExpr(b)))

  /** Column API: squared L2 distance of two array<int> columns (int
    * arithmetic, null semantics of the zip_with/aggregate composition).
    */
  def int_sq_l2(a: Column, b: Column): Column =
    exprToColumn(IntSqL2(colToExpr(a), colToExpr(b)))

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
