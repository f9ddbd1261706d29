package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * native codegen expression — the canonicalization step text dedup
  * and tokenization need before any hash touches a string: "é" as
  * U+0065 U+0301 and as U+00E9 must hash identically or every
  * downstream exact/MinHash/fingerprint operator silently treats the
  * same text as different documents.
  *
  * Spark ships no normalization function, and a Scala UDF would drop
  * the whole scan stage out of whole-stage codegen; this stays inside
  * it (the WordShingles pattern). The JDK's `java.text.Normalizer`
  * implements the same UAX #15 algorithm DuckDB's `nfc_normalize`
  * does, which is what makes the cross-engine oracle exact.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that avoids
  * allocating for already-NFC input — on real corpora (almost all of
  * any crawl is already NFC) the kernel is a read-only pass.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalizeKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeKernel {
  import java.text.Normalizer

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  /** Column-level entry point. */
  def apply(c: Column): Column = GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
