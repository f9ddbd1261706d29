package graft.tools
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextAnalysis
object DebugJaccard {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val shRaw = docs.select(col("doc_id"), explode(TextAnalysis.shinglesOfText(col("text"))).as("sh"))
    println("raw shingle rows: " + time("explode")(shRaw.count()))
    val sh = shRaw.distinct()
    println("distinct rows: " + time("distinct")(sh.count()))
    val joined = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
    println("pair rows: " + time("join")(joined.count()))
    val grouped = joined.groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).agg(count(lit(1)).as("inter"))
    println("distinct pairs: " + time("group")(grouped.count()))
    spark.stop()
  }
}
