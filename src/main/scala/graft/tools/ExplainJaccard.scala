package graft.tools
import graft.sources.Tables
import graft.dedup.TextDedup
object ExplainJaccard {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm the JVM/codegen on a first run
    val q = () => TextDedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(org.apache.spark.sql.functions.col("jaccard").desc,
        org.apache.spark.sql.functions.col("doc_a"), org.apache.spark.sql.functions.col("doc_b"))
      .limit(20)
    var df = q()
    val t0 = System.nanoTime(); df.collect(); println(f"run1: ${(System.nanoTime()-t0)/1e9}%.2f s")
    df = q()
    val t1 = System.nanoTime(); df.collect(); println(f"run2: ${(System.nanoTime()-t1)/1e9}%.2f s")
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGES=" + "ReusedExchange".r.findAllIn(plan).length)
    println("SHUFFLES=" + "Exchange".r.findAllIn(plan).length)
    spark.stop()
  }
}
