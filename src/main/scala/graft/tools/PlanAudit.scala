package graft.tools
import graft.SparkEntry
/** Prints per-query plan stats: exchanges (shuffles), broadcast joins,
  * whole-stage codegen spans, and whether scans carry pushed filters. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // AQE off for the AUDIT only: adaptive plans don't show final
    // codegen spans until execution; production sessions keep AQE on
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    println(f"${"query"}%-24s ex  bc  wsc  scan-pruned")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        val ex  = "Exchange hashpartitioning".r.findAllIn(p).length
        val bc  = "BroadcastHashJoin".r.findAllIn(p).length + "BroadcastNestedLoop".r.findAllIn(p).length
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(p).toSet.size // distinct codegen stage ids
        val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
        val wide = scans.count(_.split(",").length > 8)
        println(f"$name%-24s $ex%2d  $bc%2d  $wsc%3d  ${if (wide == 0) "ok" else s"$wide wide scans"}")
      } catch { case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
