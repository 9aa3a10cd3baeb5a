package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct `w`-token shingles of a text column — the candidate-key
  * builder under every n-gram dedup/decontamination operator
  * (`llm/Dedup.shingles`).
  *
  * Semantics (bit-identical to the Column formula it replaces —
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(split(text, " "), i, w))))` with the whole-text fallback for
  * docs shorter than `w` tokens):
  *   - tokens are `split(text, " ")` — single-space separators, empty
  *     tokens preserved (consecutive spaces), trailing empties kept;
  *   - fewer than `w` tokens → one shingle: the whole text;
  *   - otherwise every `w`-token window joined by a single space,
  *     deduplicated keeping FIRST occurrence order (what
  *     `array_distinct` does).
  *
  * Why native: the lambda chain is interpreted by Catalyst — per gram it
  * paid a `sequence` element, a `slice` array copy, and a `concat_ws`
  * (the x18 lesson). Because separators are single spaces, each gram is
  * EXACTLY a byte-slice of the original text (tokens i..i+w-1 joined by
  * " " reproduce the source span), so this kernel scans the UTF-8 bytes
  * once for space positions and emits zero-copy `UTF8String.fromBytes`
  * views deduplicated through a LinkedHashSet. Stays inside whole-stage
  * codegen via the static-helper call pattern. */
case class DistinctShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"distinct_shingles: w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.DistinctShingles.compute($a, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)

  override def prettyName: String = "distinct_shingles"
}

object DistinctShingles {

  /** Static kernel — one byte scan for token boundaries, zero-copy gram
    * slices, keep-first dedup. */
  def compute(text: UTF8String, w: Int): GenericArrayData = {
    val bytes = text.getBytes // materialize once; gram views share it
    val n = bytes.length
    // token start offsets: 0 and every byte after a space (0x20 is never
    // part of a multi-byte UTF-8 sequence, so the scan is codepoint-safe)
    var nToks = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    if (nToks < w) {
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    }
    val starts = new Array[Int](nToks + 1) // sentinel: starts(nToks) = n + 1
    var t = 1
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nToks) = n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    val grams = nToks - w + 1
    while (s < grams) {
      val from = starts(s)
      val until = starts(s + w) - 1 // end of token s+w-1 (before its separator)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry: distinct w-token shingles of a string column. */
  def distinct_shingles(text: Column, w: Int): Column =
    Bridge.column(DistinctShingles(Bridge.expression(text), w))
}
