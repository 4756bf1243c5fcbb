package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Fused IVF cell routing: argmin over k literal centroids of
  * d(c) = ‖c‖² − 2·v·c, ties to the LOWEST cell id — ONE generated loop
  * nest over one pass of the input vector, replacing k separate
  * [[DotProduct]] expressions plus a k-struct array + array_min per row
  * (the Lloyd-assignment hot path: k×dim multiply-adds stay, the k
  * struct/array allocations and the interpreted struct-min comparator go).
  * The centroid matrix rides along as a codegen reference object — the
  * [[HyperplaneSignatures]] pattern.
  *
  * Arithmetic is IDENTICAL to the composition
  * `array_min(array(struct(cnorm − 2.0·dot(v, cv), cell)…)).cell`: each
  * dot accumulates left-to-right in f64 (and inputs are integer-quantized,
  * so sums are exact regardless), the distance is `cnorm − 2.0·acc`, and
  * the (d, cell) comparison is strict-less-then-lowest-id — order
  * invariant, like the struct min. Null semantics: null if the vector is
  * null, its length mismatches the centroids, or any element is null —
  * exactly the inputs for which every per-cell d would be null; the
  * composition then resolves the struct-min to the SMALLEST cell id
  * (null d sorts first), so call sites wrap this expression in
  * `coalesce(_, lit(minCellId))` to reproduce it (pinned by
  * FunctionsSpec equivalence over value and null edges).
  */
case class CellArgmin(child: Expression, cellIds: Array[Int],
    cnorms: Array[Double], cents: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.IntegerType

  require(cellIds.nonEmpty && cellIds.length == cnorms.length &&
    cellIds.length == cents.length, "cellIds/cnorms/cents must align")

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = true

  private val dim = cents(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var bestIdx = -1
    var bestD = 0.0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += v.getDouble(i) * cv(i); i += 1 }
      val d = cnorms(c) - 2.0 * acc
      if (bestIdx < 0 || d < bestD ||
        (d == bestD && cellIds(c) < cellIds(bestIdx))) {
        bestIdx = c; bestD = d
      }
      c += 1
    }
    cellIds(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("graftCellIds", cellIds, "int[]")
    val cnRef = ctx.addReferenceObj("graftCnorms", cnorms, "double[]")
    val cvRef = ctx.addReferenceObj("graftCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val bestIdx = ctx.freshName("bestIdx")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; }
         |}
         |if (!${ev.isNull}) {
         |  int $bestIdx = -1;
         |  double $bestD = 0.0;
         |  for (int $c = 0; $c < ${cents.length}; $c++) {
         |    double[] $cv = $cvRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $v.getDouble($i) * $cv[$i];
         |    }
         |    double $d = $cnRef[$c] - 2.0 * $acc;
         |    if ($bestIdx < 0 || $d < $bestD ||
         |        ($d == $bestD && $idsRef[$c] < $idsRef[$bestIdx])) {
         |      $bestIdx = $c; $bestD = $d;
         |    }
         |  }
         |  ${ev.value} = $idsRef[$bestIdx];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmin =
    copy(child = newChild)
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

  /** Column API: fused IVF cell argmin over literal centroids — null on
    * null/degenerate vectors; wrap in coalesce(_, lit(min cell id)) to
    * match the struct-min composition (see [[CellArgmin]]).
    */
  def cell_argmin(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    exprToColumn(CellArgmin(colToExpr(v),
      cents.map(_._1).toArray,
      cents.map(_._2.map(x => x * x).sum).toArray,
      cents.map(_._2).toArray))

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
