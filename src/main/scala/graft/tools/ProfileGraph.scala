package graft.tools

import org.apache.spark.sql.functions._

import graft.queries.GraphCore

/** Stage-by-stage wall profile of the shared triangle/edge-Jaccard
  * pipeline (`q_edge_jaccard` has been the suite's slowest query for
  * three rounds) — times each materialization boundary separately so
  * a regression localizes to a stage instead of a query. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // warm the JVM on the small SF first
    FullEval.run(graft.queries.GraphB.edgeJaccard(spark, "/root/testdata/sf0.001"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val ed = t("copurchaseEdges")(GraphCore.copurchaseEdges(spark, dir))
      val or = t("orientedOf")(GraphCore.orientedOf(ed))
      val bf = t("edgeBloom")(GraphCore.edgeBloom(or))
      println(s"[prof] bloom bytes: ${if (bf == null) -1 else bf.length}")
      t("triangles eval")(FullEval.run(GraphCore.triangles(or)))
      t("edge_jaccard end-to-end")(FullEval.run(
        graft.queries.GraphB.edgeJaccard(spark, dir)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
