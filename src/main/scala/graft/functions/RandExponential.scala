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

  // xorshift64* stream, seeded per partition through one splitmix64 mix —
  // plain long arithmetic with no allocation and no CAS (java.util.Random
  // serializes every draw through an AtomicLong; at 10⁹ draws per task
  // that is measurable). Same generator family Spark's own RDG uses.
  @transient private var state: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    state = RandExponential.mixSeed(seed + partitionIndex)

  override protected def evalInternal(input: InternalRow): Any = {
    val r = child.eval(input)
    if (r == null) null
    else {
      var s = state
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      state = s
      val u = ((s * 0x2545F4914F6CDD1DL) >>> 11) * RandExponential.DoubleUnit
      -math.log(1.0 - u) / r.asInstanceOf[Double]
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addMutableState("long", "graftExpState")
    ctx.addPartitionInitializationStatement(
      s"$st = graft.functions.RandExponential.mixSeed(${seed}L + partitionIndex);")
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        $st ^= $st >>> 12; $st ^= $st << 25; $st ^= $st >>> 27;
        ${ev.value} = -java.lang.Math.log(1.0 -
          (($st * 0x2545F4914F6CDD1DL) >>> 11) * ${RandExponential.DoubleUnit}) / ${childGen.value};
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): RandExponential =
    copy(child = newChild)
}

object RandExponential {
  /** 2⁻⁵³ — scales a 53-bit mantissa draw into [0, 1). */
  final val DoubleUnit: Double = 1.0 / (1L << 53)

  /** splitmix64 finalizer: decorrelates per-partition streams and maps the
    * pathological zero seed away (xorshift state must be non-zero).
    */
  def mixSeed(raw: Long): Long = {
    var s = raw + 0x9E3779B97F4A7C15L
    s = (s ^ (s >>> 30)) * 0xBF58476D1CE4E5B9L
    s = (s ^ (s >>> 27)) * 0x94D049BB133111EBL
    s ^= s >>> 31
    if (s == 0L) 1L else s
  }

  /** Column API: exponential sample with the given per-row rate. */
  def rand_exponential(rate: Column, seed: Long): Column =
    exprToColumn(RandExponential(colToExpr(rate), seed))
}
