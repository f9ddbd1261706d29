package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sub-stage wall profile of [[graft.queries.GraphCore.copurchaseEdges]]
  * — the one helper ALL ten graph queries rebuild (~2.5-3 s × 10 at
  * sf0.1 = ~10% of the whole bench), so its internal cost split
  * (scan+groupBy vs pair explode vs distinct vs checkpoint
  * materialization) decides where the family's shared optimization
  * budget goes. */
object ProfileEdges {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    def noop(df: DataFrame): Unit = FullEval.run(df)
    // warm
    FullEval.run(graft.queries.GraphCore.copurchaseEdges(spark, "/root/testdata/sf0.001"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
      t("scan lineitem 2 cols")(noop(li))
      val items = array_sort(collect_set(col("l_partkey")))
      val baskets = li.groupBy(col("l_orderkey")).agg(items.as("items"))
      t("groupBy collect_set")(noop(baskets))
      val pairs = baskets
        .select(explode(flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + 2, size(col("items"))),
            y => struct(x.as("src"), y.as("dst")))))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      t("+ pair explode")(noop(pairs))
      val dist = pairs.distinct()
      t("+ distinct")(noop(dist))
      t("full copurchaseEdges (checkpoint)") {
        graft.queries.GraphCore.copurchaseEdges(spark, dir)
      }
      t("n_edges count") {
        println("  n=" + graft.queries.GraphCore.copurchaseEdges(spark, dir).count())
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
