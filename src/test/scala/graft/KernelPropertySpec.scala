package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{MinHashKernel, SimHashKernel, WordShinglesKernel}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic fuzz tests: native kernels vs straightforward Scala
  * models on adversarial strings (empty tokens, repeated separators,
  * unicode). */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val vocab = Seq("", "a", "ab", "héllo", "東京", "x1", "longertoken", "q")
  private def randomText(): String =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  private val cases: Seq[String] =
    Seq("", " ", "  ", "a", "a b", "a b c", "a  b  c d") ++ Seq.fill(300)(randomText())

  private def modelShingles(s: String, n: Int): Seq[String] = {
    val toks = s.split(" ", -1).toSeq
    if (toks.length < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq
  }
  private def md5hex(b: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(b).map("%02x".format(_)).mkString
  }

  test("WordShingles kernel matches sliding-window model") {
    cases.foreach { s =>
      val got = WordShinglesKernel.compute(UTF8String.fromString(s), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == modelShingles(s, 3), s"for '$s'")
    }
  }

  test("SimHash kernel matches md5-nibble vote model") {
    cases.foreach { s =>
      val got = SimHashKernel.compute(UTF8String.fromString(s), 32).toString
      val toks = s.split(" ", -1)
      val expected = (0 until 32).map { i =>
        val votes = toks.map { t =>
          if ("89abcdef".contains(md5hex(t.getBytes("UTF-8")).charAt(i))) 1 else -1
        }.sum
        if (votes > 0) '1' else '0'
      }.mkString
      assert(got == expected, s"for '$s'")
    }
  }

  test("MinHash kernel matches min-of-salted-md5 model") {
    cases.foreach { s =>
      val got = MinHashKernel.compute(UTF8String.fromString(s), 4, 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(u => Option(u).map(_.toString)).toSeq
      val sh = modelShingles(s, 3)
      val expected = (0 until 4).map { h =>
        val hashes = sh.map(x => md5hex(s"$h:$x".getBytes("UTF-8")))
        if (hashes.isEmpty) None else Some(hashes.min)
      }
      assert(got == expected, s"for '$s'")
    }
  }

  test("Misra-Gries summary: no false negatives above N/(k+1), bounded size, mergeable") {
    val k = 8
    val agg = graft.plans.HeavyHittersAgg(k)
    // adversarial mix: two heavy items buried in a long distinct tail
    val heavy = Seq.fill(60)("H1") ++ Seq.fill(45)("H2")
    val tail = (1 to 200).map(i => s"t$i")
    val r = new scala.util.Random(7)
    val stream = r.shuffle(heavy ++ tail)
    val n = stream.size
    val bound = n / (k + 1) // max undercount

    // sequential reduce: heavy items present, counts within bound
    val m = stream.foldLeft(agg.zero)(agg.reduce)
    assert(m.size <= k, s"summary overflowed: ${m.size}")
    assert(m.contains("H1") && m.contains("H2"))
    assert(60 - m("H1") <= bound && m("H1") <= 60)
    assert(45 - m("H2") <= bound && m("H2") <= 45)

    // distributed shape: chunked partials merged in arbitrary order
    // keep the same guarantee (mergeable-summaries property)
    val parts = stream.grouped(37)
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = r.shuffle(parts).reduce(agg.merge)
    assert(merged.size <= k)
    assert(merged.getOrElse("H1", 0L) >= 60 - bound)
    assert(merged.getOrElse("H2", 0L) >= 45 - bound)
  }
}
