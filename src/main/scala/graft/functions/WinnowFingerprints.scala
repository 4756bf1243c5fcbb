package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{colToExpr, exprToColumn, AbstractDataType}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint selection over a token array: md5-hash
  * every k-token gram ONCE, slide a w-window over the hash sequence, emit
  * the distinct window minima in first-occurrence order.
  *
  * The built-in spelling (ops/Dedup.winnowFingerprintsLambda) must NEST
  * the window lambda inside the gram lambda — materializing the gram-hash
  * array as a column would get re-inlined per slice() reference by
  * CollapseProject (the shingles() O(n²) trap) — so it re-hashes every
  * gram w times and pays interpreted-lambda dispatch per element. This
  * expression walks the ArrayData once (n md5 calls, not w·n), keeps the
  * hash array in a local, and participates in whole-stage codegen via a
  * static helper call — the preference-order (b) custom scalar, same tier
  * as [[DotProduct]].
  *
  * Output is BIT-IDENTICAL to the lambda spelling (equivalence-spec'd):
  * md5 of the UTF-8 bytes of the space-joined gram (concat_ws semantics,
  * nulls skipped), lowercase hex, window minimum by binary string order,
  * array_distinct's first-occurrence order.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.compute(a.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($ws, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val hexChars = "0123456789abcdef".toCharArray

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Hex(s: String): UTF8String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** One pass: n-k+1 gram hashes, then n-k-w+2 window minima, distinct in
    * first-occurrence order. Called from generated code — must stay a
    * plain static-shaped method.
    */
  def compute(ws: ArrayData, k: Int, w: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    val hashes = new Array[UTF8String](nGrams)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < k) { // concat_ws(" ", …) semantics: null tokens skipped
        if (!ws.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(ws.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      hashes(i) = md5Hex(sb.toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s + w <= nGrams) {
      var m = hashes(s)
      var t = 1
      while (t < w) {
        val h = hashes(s + t)
        if (h.compareTo(m) < 0) m = h
        t += 1
      }
      seen.add(m)
      s += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column API: distinct winnowed fingerprints of a token array. */
  def winnow_fingerprints(ws: Column, k: Int, w: Int): Column =
    exprToColumn(WinnowFingerprints(colToExpr(ws), k, w))
}
