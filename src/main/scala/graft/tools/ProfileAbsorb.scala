package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.LshIndex
import graft.sources.Snapshots

/** Phase wall profile of [[LshIndex.absorbBatch]] — the unit of cost
  * under every incremental LSH gate and the week gates' ingest rows
  * (~3.5 s for a 750-doc batch at sf0.1, which is fixed overhead, not
  * data). Replicates the body with a timer per materialization/commit
  * so the cost splits into signing, probe, verify and the two
  * artifact appends. */
object ProfileAbsorb {
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
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd")
      val root = java.nio.file.Files
        .createTempDirectory("graft-profabsorb").toString + "/lsh"
      t("build")(LshIndex.build(corpus, root))
      val batch = graft.queries.Indexing.weekBatch(corpus, 0).localCheckpoint()
      val batchId = 0L
      val bb = t("bandsOf ckpt")(
        LshIndex.bandsOf(batch, LshIndex.rowsPerBandOf(root)).localCheckpoint())
      val cand = t("probeCandidates ckpt")(
        LshIndex.probeCandidates(spark, root, bb,
          batch.select(col("doc_id"))).localCheckpoint())
      val dmods = t("dmods collect")(
        cand.select(pmod(col("match_id"), lit(LshIndex.Dmods)).cast("int").as("dmod"))
          .distinct().collect().map(_.getInt(0)).toSeq)
      val sh = t("shinglesOf ckpt")(
        LshIndex.shinglesOf(batch).localCheckpoint())
      val batchSh = sh.select(col("doc_id").as("new_id"), col("shs").as("sa"))
      val storedSh = Snapshots.read(spark, LshIndex.shinglesRoot(root))
        .filter(col("dmod").isin(dmods: _*))
        .select(col("doc_id").as("match_id"), col("shs").as("sb"))
      val matchSh = storedSh.unionByName(
        batchSh.select(col("new_id").as("match_id"), col("sa").as("sb")))
        .groupBy(col("match_id")).agg(first(col("sb")).as("sb"))
      val out = cand
        .join(batchSh.hint("shuffle_hash"), Seq("new_id"))
        .join(matchSh.hint("shuffle_hash"), Seq("match_id"))
        .withColumn("__inter", size(array_intersect(col("sa"), col("sb"))))
        .select(col("new_id"), col("match_id"),
          round(col("__inter") /
            (size(col("sa")) + size(col("sb")) - col("__inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= LshIndex.JaccardMin)
      t("verify eval (noop)")(FullEval.run(out))
      t("commitAppend bands")(
        Snapshots.commitAppend(bb, LshIndex.bandsRoot(root), Seq("bmod"), Some(batchId)))
      t("commitAppend shingles")(
        Snapshots.commitAppend(sh, LshIndex.shinglesRoot(root), Seq("dmod"), Some(batchId)))
      spark.sparkContext.getPersistentRDDs.values
        .filter(_ != corpus.rdd).foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
