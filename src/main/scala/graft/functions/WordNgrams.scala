package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A native Catalyst GENERATOR (the table-valued 1→k expression class —
  * the integration point explode/inline/posexplode are built on, and the
  * one extension surface the custom-expression family here did not yet
  * subclass): `word_ngrams(text, n)` emits one (pos, gram) row per word
  * n-gram of the whitespace-tokenized, trimmed, lowercased text.
  *
  * Each output row is produced directly as an InternalRow from one pass
  * over the tokens — no intermediate array-of-structs value is
  * materialized the way the equivalent
  * `posexplode(transform(sequence(...), i -> concat_ws(...)))` pipeline
  * builds (and copies) a full array per document before exploding it.
  * Blank or too-short documents generate nothing (explode_outer-style
  * absence, matching the SQL twin's WHERE len >= n). `n` must be a
  * positive integer literal: generators are bound at planning time, and
  * a data-dependent arity would defeat the schema contract.
  *
  * Tokenization matches the corpus-wide convention exactly (trim →
  * lower(ROOT) → split on \s+) so results are oracle-checkable against
  * DuckDB's regexp_split_to_array formulation, and FunctionsSpec pins
  * equivalence against the built-in-composition pipeline on the real
  * corpus.
  */
case class WordNgrams(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("word_ngrams: text must be STRING")
    else nExpr match {
      case Literal(v: Int, IntegerType) if v >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("word_ngrams: n must be a positive INT literal")
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val text = t.asInstanceOf[UTF8String].toString
        .trim.toLowerCase(java.util.Locale.ROOT)
      if (text.isEmpty) Nil
      else {
        val words = text.split("\\s+")
        if (words.length < n) Nil
        else new Iterator[InternalRow] {
          private var i = 0
          override def hasNext: Boolean = i <= words.length - n
          override def next(): InternalRow = {
            val sb = new java.lang.StringBuilder(words(i))
            var j = i + 1
            while (j < i + n) { sb.append(' ').append(words(j)); j += 1 }
            val row = InternalRow(i, UTF8String.fromString(sb.toString))
            i += 1
            row
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
