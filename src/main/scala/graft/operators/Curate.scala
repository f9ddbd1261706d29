package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The corpus-curation stages as reusable operators — the building
  * blocks behind `q_domain_mix`, `q_pack_sequences` and
  * `q_curation_pipeline` (each oracle-gated), and the operational
  * [[graft.pipelines.CurationJob]].
  *
  * Scale shapes: the quality gate and mixture bucket are row-local;
  * exact dedup is one hash shuffle; mixture thresholds come from two
  * TINY aggregates broadcast back; packing is one window shuffle
  * keyed (source, shard) so parallelism scales with shard count.
  */
object Curate {

  /** Keep one row per distinct text (lowest id wins) — exact dedup as
    * a curation stage. */
  def dedupKeepOne(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Default domain-mixture weights (token-share targets) used by the
    * gated queries. */
  def defaultWeight: Column =
    when(col("source") === "src0", 0.20)
      .when(col("source") === "src1", 0.04)
      .when(col("source") === "src2", 0.025)
      .otherwise(0.015)

  /** Per-source sampling thresholds in 16-bit bucket units:
    * rate = min(1, w·T/S) over measured token counts. `docs` needs
    * (source, ntok); the two aggregates are tiny and broadcast back
    * by the caller's join. */
  def mixtureThresholds(docs: DataFrame, weight: Column): DataFrame = {
    val perSrc = docs.groupBy(col("source")).agg(sum(col("ntok")).as("src_tokens"))
    val total = perSrc.agg(sum(col("src_tokens")).as("total"))
    perSrc.crossJoin(broadcast(total)).select(
      col("source"),
      floor(least(lit(1.0),
        weight * col("total").cast("double") / col("src_tokens").cast("double"))
        * 65536).cast("long").as("thresh"))
  }

  /** Deterministic uniform 16-bit bucket per doc id (4 md5 hex digits
    * via strpos — uniform, unlike raw ascii codes). */
  def mixBucket(idCol: String): Column = {
    val h = md5(concat(col(idCol).cast("string"), lit(":mix")))
    val hex = "0123456789abcdef"
    (1 to 4).map(i =>
      (instr(lit(hex), substring(h, i, 1)) - 1) * (1 << (4 * (4 - i))))
      .reduce(_ + _)
  }

  /** Resample to the mixture: keep docs whose bucket clears their
    * source's threshold. `docs` needs (idCol, source, ntok). */
  def mixtureResample(docs: DataFrame, weight: Column, idCol: String): DataFrame =
    docs.join(broadcast(mixtureThresholds(docs, weight)), "source")
      .filter(mixBucket(idCol) < col("thresh"))

  /** Lay docs into contiguous token-budget bins per (source, shard)
    * via one window cumsum; returns the per-bin packing table.
    * `docs` needs (idCol, source, shard, ntok). */
  def packBins(docs: DataFrame, idCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum", sum(col("ntok")).over(w))
      .withColumn("bin", floor((col("__cum") - col("ntok")) / budget).cast("long"))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("bin_tokens"),
        round(sum(col("ntok")).cast("double") / budget, 6).as("fill_ratio"))
  }
}
