package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.dedup.BloomIndex
import graft.functions.TextAnalysis
import graft.operators.Curate

/** The corpus-curation chain as an OPERATIONAL job: quality gate →
  * exact dedup → mixture resample → sequence packing, materializing
  * the three artifacts a training-data pipeline actually consumes:
  *
  *  - `<out>/curated`       the kept documents (parquet, partitioned
  *                          by source — downstream readers prune)
  *  - `<out>/bins`          the packing table (which docs fill which
  *                          2048-token training bins)
  *  - `<out>/corpus.bloom`  the content-hash membership index the
  *                          NEXT incremental batch loads to skip
  *                          re-deduping against this corpus
  *                          ([[BloomIndex]])
  *
  * The query-surface twin is `q_curation_pipeline` (oracle-gated);
  * this is the same logic via the same [[Curate]] operators, plus the
  * writes. Overwrite mode end-to-end: re-running the job on the same
  * input produces the same artifacts (idempotent).
  */
object CurationJob {

  final case class Report(
      input: Long, afterQuality: Long, afterDedup: Long, afterMix: Long, bins: Long)

  def run(docs: DataFrame, outPrefix: String, budget: Int = 2048): Report = {
    val input = docs.count()
    // kept is persisted too: afterQuality and the dedup derivation
    // would otherwise each re-scan and re-filter the full input
    val kept = docs.filter(TextAnalysis.qualityPass(col("text"))).persist()
    try {
      val afterQuality = kept.count()
      val deduped = Curate.dedupKeepOne(kept, "doc_id", "text").persist()
      try {
        val afterDedup = deduped.count()
        deduped.write.mode(SaveMode.Overwrite)
          .partitionBy("source").parquet(s"$outPrefix/curated")
        // sized from the known cardinality — a fixed-size sketch would
        // saturate on a large corpus and prune nothing
        val index = BloomIndex.build(
          deduped.select(md5(col("text")).as("content_hash")), "content_hash",
          math.max(afterDedup, 1L))
        BloomIndex.save(index, s"$outPrefix/corpus.bloom")
        val sized = deduped.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        val mixed = Curate.mixtureResample(sized, Curate.defaultWeight, "doc_id")
          .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("long"))
          .persist()
        try {
          val bins = Curate.packBins(mixed, "doc_id", budget)
          bins.write.mode(SaveMode.Overwrite).parquet(s"$outPrefix/bins")
          Report(input, afterQuality, afterDedup, mixed.count(),
            docs.sparkSession.read.parquet(s"$outPrefix/bins").count())
        } finally mixed.unpersist()
      } finally deduped.unpersist()
    } finally kept.unpersist()
  }
}
