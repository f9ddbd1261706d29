package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dumps `explain("formatted")` for named queries to files:
  * `runMain graft.tools.ExplainQuery q_a,q_b <outDir> [suffix] [sfDir]`
  * writes `<outDir>/<name>_<suffix>.txt` (suffix defaults to "plan").
  * AQE is left ON (the production posture) — the dump is the initial
  * adaptive plan, which carries the Exchange placement, join
  * strategies and scan pushdowns the optimization notes cite. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ExplainQuery q_a[,q_b...] outDir [suffix] [sfDir]")
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "plan"
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(s"$outDir/${q}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[explain] wrote $outDir/${q}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
