package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.plans.{CosineSimilarity, MinHashSigs, NfcNormalize, SimHashBits, WordShingles}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql` users get the codegen
  * kernels too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT cosine_similarity(a, b), word_shingles(text, 3) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "cosine_similarity"),
        GraftExtensions.cosineBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[WordShingles].getName, "word_shingles"),
        GraftExtensions.shinglesBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_bits"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHashBits].getName, "simhash_bits"),
        GraftExtensions.simhashBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashSigs].getName, "minhash_sigs"),
        GraftExtensions.minhashBuilder))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NfcNormalize].getName, "nfc_normalize"),
        GraftExtensions.nfcBuilder))
  }
}

object GraftExtensions {
  private[graft] val cosineBuilder: Seq[Expression] => Expression =
    args => CosineSimilarity(args(0), args(1))

  private[graft] val shinglesBuilder: Seq[Expression] => Expression =
    args => {
      val n = args.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(3)
      WordShingles(args.head, n)
    }

  private[graft] val simhashBuilder: Seq[Expression] => Expression =
    args => {
      val bits = args.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(32)
      SimHashBits(args.head, bits)
    }

  private[graft] val minhashBuilder: Seq[Expression] => Expression =
    args => {
      val k = args.lift(1).map(_.eval(null).asInstanceOf[Int]).getOrElse(8)
      val n = args.lift(2).map(_.eval(null).asInstanceOf[Int]).getOrElse(3)
      MinHashSigs(args.head, k, n)
    }

  private[graft] val nfcBuilder: Seq[Expression] => Expression =
    args => NfcNormalize(args.head)

  /** Register the graft SQL functions on an already-running session
    * (the builder-time path is `.withExtensions(new GraftExtensions)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity", cosineBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles", shinglesBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_bits", simhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sigs", minhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", nfcBuilder, "scala_udf")
  }
}
