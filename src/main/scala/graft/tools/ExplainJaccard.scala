package graft.tools
import graft.sources.Tables
import graft.dedup.TextDedup
object ExplainJaccard {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = TextDedup.jaccardPairs(Tables.documents(spark, "/root/testdata/sf0.01"), "doc_id", "text")
    df.explain("formatted")
    spark.stop()
  }
}
