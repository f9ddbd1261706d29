package graft.tools

import org.apache.spark.sql.functions._

/** Replay-mode phase profile of `q_curation_week` — the bench's two
  * slowest rows run against PERSISTENT roots, where every day's
  * absorb no-ops its appends and nightly compacts already-compacted
  * chains, so the in-bench ~10 s is pure probe/verify/metadata cost.
  * Times each day's absorbDaily and nightly separately plus the
  * final read on the existing week root. */
object ProfileWeekReplay {
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
    import graft.pipelines.CurationJob
    import graft.sources.{Snapshots, Tables}
    import graft.dedup.LshIndex
    import graft.queries.Indexing
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd")
      val corpus = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        .localCheckpoint()
      val base = LshIndex.defaultRoot(corpus) + "-week"
      val (curatedRoot, lshRoot) = (s"$base/curated", s"$base/lsh")
      if (Snapshots.latestVersion(curatedRoot).isEmpty)
        Snapshots.commit(corpus, curatedRoot)
      LshIndex.buildIfAbsent(corpus, lshRoot)
      for (d <- 0 until 7) {
        t(s"absorbDaily day $d")(
          CurationJob.absorbDaily(Indexing.weekBatch(corpus, d), curatedRoot,
            lshRoot, batchId = d.toLong))
        t(s"nightly day $d")(
          CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 3))
      }
      t("final read + hash")(FullEval.run(
        Snapshots.read(spark, curatedRoot)
          .select(col("doc_id"), md5(col("text")).as("content_hash"))))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
