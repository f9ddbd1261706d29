package graft.tools

import org.apache.spark.sql.SaveMode

import graft.SparkEntry

/** Times one or more queries with a FULL-evaluation action (noop-format
  * write — `count()` would let Catalyst prune every computed column and
  * measure only the scan): `runMain graft.tools.TimeQuery q_a,q_b [sfDir]`,
  * warm pass then min-of-2 timed passes per query. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.mode(SaveMode.Overwrite).format("noop").save()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode(SaveMode.Overwrite).format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[time] $q%-24s $t%7.2fs")
    }
    spark.stop()
  }
}
