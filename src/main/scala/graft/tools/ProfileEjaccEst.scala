package graft.tools

import org.apache.spark.sql.functions._

import graft.queries.GraphCore

/** Phase wall profile of `q_edge_jaccard_estimate` (bench row ~9-12 s
  * at sf0.1 — nearly the exact form's cost, defeating the estimator's
  * purpose): times each materialization boundary so the fixed
  * overhead (edge build, redundant dedup, sampled orientation, wedge
  * probe, exact-side re-score) localizes. */
object ProfileEjaccEst {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    FullEval.run(graft.queries.GraphB.edgeJaccardEstimate(spark, "/root/testdata/sf0.001"))
    cleanup()
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd")
      val edges = t("copurchaseEdges")(GraphCore.copurchaseEdges(spark, dir))
      val canon = edges.filter(col("src") < col("dst"))
      val h = md5(concat(col("src").cast("string"), lit(":"),
        col("dst").cast("string"), lit(":ejacc")))
      val pct = (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 100
      val sampled = t("edgesFromPairs(sample)")(GraphCore.edgesFromPairs(
        canon.filter(pct < 50).select(col("src").as("pa"), col("dst").as("pb"))))
      val or = t("orientedOf(sampled)")(GraphCore.orientedOf(sampled))
      t("triangles(sampled) eval")(FullEval.run(GraphCore.triangles(or)))
      // post-triangle phases of the real query body
      def edge(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        struct(least(x, y).as("pa"), greatest(x, y).as("pb"))
      val cnS = GraphCore.triangles(or)
        .select(explode(array(
          edge(col("a"), col("b")), edge(col("b"), col("c")),
          edge(col("a"), col("c")))).as("e"))
        .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .agg(count(lit(1)).as("cn_s"))
      t("cnS eval")(FullEval.run(cnS))
      val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val ce = least(col("cn_s") * lit(65536.0) / lit(15876.0),
        least(col("dega"), col("degb")).cast("double"))
      val top = t("top20 (ckpt)")(cnS
        .join(deg.select(col("node"), col("deg").as("dega")),
          col("pa") === col("node")).drop("node")
        .join(deg.select(col("node"), col("deg").as("degb")),
          col("pb") === col("node")).drop("node")
        .select(col("pa"), col("pb"), col("cn_s"),
          ce.as("ce"), (col("dega") + col("degb")).as("dsum"))
        .withColumn("je", col("ce") / (col("dsum") - col("ce")))
        .orderBy(round(col("je"), 6).desc, col("pa"), col("pb"))
        .limit(20)
        .localCheckpoint())
      val t20 = broadcast(top.select(col("pa"), col("pb")))
      val wedges = edges.join(t20, col("src") === col("pa"))
        .select(col("pa"), col("pb"), col("dst").as("w"))
      val cnX = wedges.join(
          edges.select(col("src").as("s2"), col("dst").as("d2")),
          col("s2") === col("pb") && col("d2") === col("w"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cn"))
      t("exact side (cnX)")(FullEval.run(cnX))
      t("end-to-end")(FullEval.run(
        graft.queries.GraphB.edgeJaccardEstimate(spark, dir)))
      cleanup()
    }
    spark.stop()
  }
}
