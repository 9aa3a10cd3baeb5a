package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static normalization kernels shared by interpreted eval and generated
  * code (codegen calls them by fully-qualified name). `java.text
  * .Normalizer` is the JDK's Unicode-standard implementation, so results
  * agree with any other conformant engine (DuckDB's `nfc_normalize` — the
  * oracle twin). The String round-trip is unavoidable (the JDK API is
  * String-based); the fast path skips it entirely for inputs that are
  * already in NFC — the overwhelmingly common case in a crawl corpus —
  * via `Normalizer.isNormalized`, which for ASCII is a cheap scan. */
object TextNormalizeKernels {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose then drop combining marks (category M) — the textbook
    * accent strip (same contract as DuckDB `strip_accents` on Latin
    * text). ASCII fast path avoids the decompose. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) && str.forall(_ < 128)) s
    else {
      val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Why custom (Spark has no `normalize` SQL function at all): a Scala
  * UDF would work but drops out of whole-stage codegen and pays
  * serialization per row; this node stays inside the generated loop —
  * `doGenCode` emits a single static call, so the surrounding projection
  * keeps one codegen span. Reference behavior: the reference pipeline's
  * text cleanup stage (`public_eda_pipeline.py` string ops family);
  * oracle twin is DuckDB `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNormalizeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizeKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Accent stripping (NFD + drop combining marks) as a native Catalyst
  * expression — same codegen rationale as [[NfcNormalize]]; oracle twin
  * is DuckDB `strip_accents`. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNormalizeKernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalizeKernels.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}
