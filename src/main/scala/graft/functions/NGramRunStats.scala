package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row n-gram repetition statistics over a token array — the kernel
  * of the Gopher repetition gates (`TextStats.gopherGates`).
  *
  * For the row's word `n`-grams (space-joined), computes in one pass:
  *   - `best_c`   — occurrence count of the most frequent n-gram (ties
  *                  resolve to the binary-lexicographically smallest,
  *                  matching `array_sort` + strictly-greater run scan);
  *   - `best_len` — that n-gram's length in characters;
  *   - `dup`      — Σ over n-grams occurring more than once of
  *                  count × char-length (the "chars inside duplicated
  *                  n-grams" numerator).
  *
  * Why a custom `Expression`: the first implementation was an
  * `aggregate()` higher-order run-scan over `array_sort(transform(...))`.
  * Catalyst evaluates lambda functions interpreted — per GRAM it paid a
  * struct allocation plus a chain of `when` branches, ~24M lambda
  * evaluations at sf0.1 and the top cost of the whole bench (6.9 s warm).
  * This node builds, sorts, and scans the gram array in tight JVM code;
  * `doGenCode` stays inside whole-stage codegen by emitting a call to the
  * static [[NGramRunStats.compute]] helper (the standard built-in
  * pattern for non-trivial kernels).
  *
  * Gram ordering is `UTF8String`'s binary comparison — identical to
  * `array_sort` on strings and to DuckDB's default VARCHAR collation, so
  * tie-breaks agree with the x18 oracle. Char lengths are codepoint
  * counts (`UTF8String.numChars`), matching SQL `length()` on both
  * engines.
  */
case class NGramRunStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_run_stats: n must be >= 1, got $n")

  override def dataType: DataType = NGramRunStats.OutType

  override def nullSafeEval(input: Any): Any =
    NGramRunStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.NGramRunStats.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): NGramRunStats =
    copy(child = newChild)

  override def prettyName: String = "ngram_run_stats"
}

object NGramRunStats {
  val OutType: StructType = StructType(Seq(
    StructField("best_c", LongType, nullable = false),
    StructField("best_len", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** Static kernel so generated code is one call — keeps the surrounding
    * stage in whole-stage codegen. */
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val m = arr.numElements()
    if (m < n) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val cnt = m - n + 1
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val grams = new Array[UTF8String](cnt)
    i = 0
    while (i < cnt) {
      var g = toks(i)
      var j = 1
      while (j < n) { g = UTF8String.concat(g, Space, toks(i + j)); j += 1 }
      grams(i) = g
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[Object]])
    var bestC = 0L; var bestLen = 0L; var dup = 0L
    var start = 0
    i = 1
    while (i <= cnt) {
      if (i == cnt || !grams(i).equals(grams(start))) {
        val run = (i - start).toLong
        val glen = grams(start).numChars().toLong
        if (run > bestC) { bestC = run; bestLen = glen }
        if (run > 1L) dup += run * glen
        start = i
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestC, bestLen, dup))
  }

  /** Column-API entry: n-gram run statistics over an `array<string>`. */
  def ngram_run_stats(tokens: Column, n: Int): Column =
    Bridge.column(NGramRunStats(Bridge.expression(tokens), n))
}
