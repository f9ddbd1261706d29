package graft.tools

import graft.SparkEntry

/** Times one or more queries with the FULL-evaluation action
  * ([[FullEval]]): `runMain graft.tools.TimeQuery q_a,q_b [sfDir]`,
  * warm pass then min-of-2 timed passes per query. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TimeQuery q_name[,q_name...] [sfDir]")
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench.cleanup's discipline, OUTSIDE each timed window: without
    // it the localCheckpoint/persist blocks of consecutive evaluations
    // accrue (warm + 2 timed × several checkpoints per query) and the
    // numbers stop being comparable to the bench artifact's.
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      FullEval.run(fn(spark, dir))
      cleanup()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        FullEval.run(fn(spark, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }.min
      println(f"[time] $q%-24s $t%7.2fs")
    }
    spark.stop()
  }
}
