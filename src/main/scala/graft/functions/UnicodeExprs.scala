package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode canonicalization expressions — the text-cleaning
  * pass a web corpus needs before dedup/tokenization: crawled text
  * mixes NFC and NFD encodings of the SAME glyphs (café as
  * `café` vs `café`), so hash-based dedup and exact term
  * match silently miss equivalent strings until every document is
  * canonicalized.
  *
  * JVM `java.text.Normalizer` implements the Unicode standard forms,
  * so results match any other conforming engine (DuckDB's
  * `nfc_normalize`, Python's `unicodedata.normalize`) — which is what
  * makes these oracle-checkable cross-engine.
  *
  * Same design as TextHashExprs: a static-forwarder helper called
  * from `defineCodeGen`, so the pass stays inside whole-stage
  * codegen (no UDF, no stage break), evaluated per-row at the scan.
  */
object UnicodeExprs {
  private val Helper = "graft.functions.UnicodeExprs"

  // ---- public row-eval helpers, callable from generated code ----

  def nfcEval(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most real
    // text is already NFC and allocates nothing here
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose then drop combining marks (Unicode category Mn) —
    * the classic "strip accents" fold (café → cafe), matching
    * DuckDB's `strip_accents` on Latin text.
    */
  def foldAccentsEval(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Canonical-composition normalization (Unicode NFC). */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc_normalize"

    override protected def nullSafeEval(input: Any): Any =
      nfcEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Helper.nfcEval($c)")

    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  /** NFD + strip combining marks (accent folding). */
  case class FoldAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_fold_accents"

    override protected def nullSafeEval(input: Any): Any =
      foldAccentsEval(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Helper.foldAccentsEval($c)")

    override protected def withNewChildInternal(c: Expression): FoldAccents =
      copy(child = c)
  }
}

/** Column-facing wrappers. */
object UnicodeFns {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}
  import UnicodeExprs._

  def nfcNormalize(text: Column): Column =
    column(NfcNormalize(expression(text)))

  def foldAccents(text: Column): Column =
    column(FoldAccents(expression(text)))
}
