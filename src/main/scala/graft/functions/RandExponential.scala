package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `Exp(rate)` sampler as a native nondeterministic Catalyst expression —
  * the reference's claim-frequency draw (docker_files/src/main.rs:67:
  * `Exp::new(1.0/(term/365))`) in the engine's own expression language.
  *
  * Semantics: per row, draw u~U[0,1) from a per-partition RNG seeded with
  * `seed + partitionIndex` (the `Rand` pattern — reproducible for a fixed
  * partition layout) and return `-ln(1-u)/rate`. `rate ≤ 0` yields NaN /
  * negative values rather than the reference's panic; callers filter.
  *
  * The built-in rewrite `-log(1-rand(seed))/rate` is semantically
  * identical (SURVEY.md §2.8); this expression exists as the preference-
  * order (b) custom scalar with true codegen, and to keep the sampling
  * semantics named and testable.
  */
case class RandExponential(child: Expression, seed: Long)
    extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = DoubleType

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed + partitionIndex)

  override protected def evalInternal(input: InternalRow): Any = {
    val r = child.eval(input)
    if (r == null) null
    else -math.log(1.0 - rng.nextDouble()) / r.asInstanceOf[Double]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngTerm = ctx.addMutableState("java.util.Random", "graftExpRng")
    ctx.addPartitionInitializationStatement(
      s"$rngTerm = new java.util.Random(${seed}L + partitionIndex);")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${ev.value} = -java.lang.Math.log(1.0 - $rngTerm.nextDouble()) / ${childGen.value};
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): RandExponential =
    copy(child = newChild)
}

object RandExponential {
  /** Column API: exponential sample with the given per-row rate. */
  def rand_exponential(rate: Column, seed: Long): Column =
    exprToColumn(RandExponential(colToExpr(rate), seed))
}
