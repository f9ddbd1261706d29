package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature vector (k salted-md5 minima over word 3-gram
  * shingles) of a space-separated text column, as one native pass.
  *
  * Bit-equal to the higher-order composition
  * `array_min(transform(shingles, s -> md5(concat("h:", s))))` per
  * salt h (and to the DuckDB `list_min(list_transform(...))` oracle):
  * same salts, same md5-hex lexicographic minima. The HOF form builds
  * k intermediate hash arrays per row through interpreted lambdas;
  * this kernel streams shingles once, updating k running minima —
  * no allocation beyond the k-slot result.
  *
  * Null signature slots when the document has fewer than n tokens
  * (array_min of an empty array is null — preserved).
  */
case class MinHashSigs(child: Expression, k: Int, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashKernel.compute($c, $k, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashKernel {
  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    val shingles = WordShinglesKernel.compute(text, n)
    val mins = new Array[String](k)
    val md = java.security.MessageDigest.getInstance("MD5")
    val num = shingles.numElements()
    var i = 0
    while (i < num) {
      val sh = shingles.getUTF8String(i).toString
      var h = 0
      while (h < k) {
        val d = md.digest((h + ":" + sh).getBytes(StandardCharsets.UTF_8))
        val hex = toHex(d)
        if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(i * 2) = HexDigits(b >>> 4)
      out(i * 2 + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }
}

object MinHashSigs {
  def apply(text: Column, k: Int = 8, n: Int = 3): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(text), k, n))
}
