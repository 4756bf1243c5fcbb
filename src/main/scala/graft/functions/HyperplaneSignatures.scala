package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All random-hyperplane LSH signatures of a vector in one expression.
  *
  * `planes(t)(p)` is the ±1 hyperplane for bit p of table t; the result is
  * one long per table whose bit p is set iff `v · planes(t)(p) ≥ 0`.
  * Replaces nTables·bitsPerTable separate dot-product expressions with a
  * single generated loop nest over one pass of the input vector — both the
  * Janino compile cost and the per-row work drop by the fan-out factor.
  * The plane matrix rides along as a codegen reference object.
  */
case class HyperplaneSignatures(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val nTables = planes.length
  private val bitsPerTable = planes.headOption.map(_.length).getOrElse(0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def compute(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < bitsPerTable) {
        val plane = planes(t)(p)
        var acc = 0.0
        var i = 0
        val d = math.min(n, plane.length)
        while (i < d) {
          if (!v.isNullAt(i)) acc += v.getDouble(i) * plane(i)
          i += 1
        }
        if (acc >= 0) sig |= (1L << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    sigs
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      val sig = ctx.freshName("sig")
      val d = ctx.freshName("d")
      s"""
         |long[] $sigs = new long[${nTables}];
         |for (int $t = 0; $t < ${nTables}; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < ${bitsPerTable}; $p++) {
         |    double[] $plane = $planesRef[$t][$p];
         |    double $acc = 0.0;
         |    int $d = java.lang.Math.min($v.numElements(), $plane.length);
         |    for (int $i = 0; $i < $d; $i++) {
         |      if (!$v.isNullAt($i)) { $acc += $v.getDouble($i) * $plane[$i]; }
         |    }
         |    if ($acc >= 0) { $sig |= (1L << $p); }
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

object HyperplaneSignatures {
  /** Column API: LSH signatures (one long per table) of an array<double>. */
  def hyperplane_signatures(v: Column, planes: Array[Array[Array[Double]]]): Column =
    exprToColumn(HyperplaneSignatures(colToExpr(v), planes))
}
