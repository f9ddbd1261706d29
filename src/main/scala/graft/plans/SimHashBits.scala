package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash bit vector of a space-separated text column, as a native
  * expression.
  *
  * Bit i votes +1 per token whose i-th md5 hex digit has its high
  * nibble bit set (digit ≥ 8), else -1; bit i of the output is 1 when
  * the vote is positive — exactly the semantics of the higher-order
  * composition in [[graft.dedup.TextDedup.simhashHof]] and of the
  * DuckDB oracle. The HOF version evaluates `md5(token)` once PER BIT
  * (32 times per token, interpreted); this kernel digests each token
  * once and updates all bit counters in one pass — the difference
  * between O(bits·tokens) digests and O(tokens) at corpus scale.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashKernel.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashKernel {
  def compute(text: UTF8String, bits: Int): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      var i = 0
      while (i < bits) {
        val b = d(i / 2) & 0xff
        val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
        votes(i) += (if (nib >= 8) 1 else -1)
        i += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(bits)
    var i = 0
    while (i < bits) { sb.append(if (votes(i) > 0) '1' else '0'); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

object SimHashBits {
  def apply(text: Column, bits: Int): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(text), bits))
}
