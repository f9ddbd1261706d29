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
}
