package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-technique batch B (SURVEY §2 #147, #150): bloom-filter join
  * pruning (#147) — the runtime-filter technique that keeps a big
  * fact table from shuffling rows a selective dim join would discard
  * anyway — and sampled aggregate estimation with confidence bounds
  * (#150), the approximate-query-processing move that answers "about
  * how much" from a 5% scan when the exact number isn't worth 20× the
  * IO.
  */
object ScaleOpsB {

  /** #147 BLOOM-FILTER JOIN PRUNING — join lineitem against a
    * SELECTIVE slice of orders (urgent orders from 1997 on), with a
    * bloom filter built over the dim keys and pushed onto the fact
    * scan as a pre-shuffle filter. At 100 TB this is the difference
    * between shuffling the whole fact table to discover that ~96% of
    * its rows have no match, and shuffling only the candidate rows:
    * the filter blob is a few hundred KB broadcast to every scan task,
    * false positives are removed by the exact join that follows, so
    * the RESULT is identical to the plain join — only the shuffle
    * volume changes. (Spark's own runtime-filter rule makes the same
    * move when statistics let it; building it explicitly pins the
    * behavior for any dim predicate, statistics or not.)
    *
    * Scale shape: the filter is the [[graft.dedup.BloomIndex]]
    * component (Spark's native `BloomFilterAggregate` — partial
    * sketches merge map-side, the blob reduces like a broadcast-var
    * build), membership is a codegen'd `BloomFilterMightContain`
    * LITERAL evaluated row-local inside the fact's WholeStageCodegen
    * scan stage, and the exact join is a SHUFFLE_HASH over the
    * surviving ~4%. Revenue is summed in cents as longs (exact
    * integers — engines can't disagree). */
  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val bf = graft.dedup.BloomIndex.buildSized(dim, "o_orderkey")
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .where(graft.dedup.BloomIndex.mightContain(bf, "l_orderkey"))
    fact.join(dim.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("cents")).as("rev_cents"))
      .select(col("o_year"), col("n_lines"), col("sum_qty"),
        round(col("rev_cents") / 100.0, 2).as("revenue"))
  }

  private val P16 = 3277 // sampling threshold: p = 3277/65536 ≈ 5%

  /** #150 SAMPLED AGGREGATE ESTIMATION — per-priority order count and
    * revenue totals estimated from a deterministic ~5% Bernoulli
    * sample of orders, with a 95% CI from the Horvitz–Thompson
    * variance under Poisson sampling. The whole estimate reads 5% of
    * the table; at 100 TB that is the dashboard-refresh query that
    * runs in minutes instead of hours, with the error bar telling the
    * reader exactly what the discount bought.
    *
    * Determinism AND unbiasedness: membership is `md5Raw16 < 3277`, a
    * TRUE 16-bit uniform (decoded hex digits — the raw-ascii #61
    * idiom has lumpy residues, fine for stratified rates but a bias
    * in an HT estimator whose inclusion probability must be exact);
    * every per-group sum is an EXACT integer (counts, revenue in
    * cents, squared revenue in whole dollars so the squares stay far
    * inside long range), and the final float arithmetic is one fixed
    * expression order rounded at 6.
    *
    * Scale shape: the sample predicate is row-local on the scan (no
    * shuffle to sample), then ONE map-side-combined hash agg over the
    * surviving 5%; everything downstream is group-count-sized. */
  def sampleEstimate(s: SparkSession, dir: String): DataFrame = {
    val p = lit(P16.toDouble / 65536.0)
    val dollars = round(col("o_totalprice")).cast("long")
    Tables.orders(s, dir)
      .filter(Privacy.md5Raw16(col("o_orderkey").cast("string"), ":est") < P16)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sc"),
        sum(dollars * dollars).as("sq"))
      .select(col("priority"), col("n_sampled"),
        round(col("n_sampled") / p, 6).as("est_orders"),
        round(col("sc") / p / 100.0, 6).as("est_revenue"),
        round(sqrt(col("sq").cast("double") * (lit(1.0) - p)) / p * 1.96, 6)
          .as("ci95_half"))
  }

  /** #166 BALANCED OUTPUT SHARD LAYOUT — the write-layout step before
    * publishing a corpus as N fixed shards (the output counterpart of
    * #102's z-order READ layout): every doc hash-assigned to one of 64
    * shards by the unbiased decoded-md5 uniform (the #149/#150 idiom —
    * a lumpy hash here skews shard sizes), per-shard doc/token counts,
    * and the balance factor max(tokens)/mean(tokens) every row carries
    * — the number that decides whether a 100 TB write produces
    * straggler shards. Deterministic assignment means re-runs land
    * every doc in the same shard (resumable publishing).
    *
    * Scale shape: assignment + token count ride the scan row-locally;
    * ONE map-side-combined agg to the 64-row shard frame; the balance
    * scalar attaches as a broadcast cross join. */
  def shardLayout(s: SparkSession, dir: String): DataFrame =
    shardLayoutOf(Tables.documents(s, dir))

  /** Frame-level #166 — shared with the release pipeline
    * ([[graft.pipelines.CurationJob.release]] stage `shards`). */
  private[graft] def shardLayoutOf(docs: DataFrame): DataFrame = {
    val S = 64
    val shard = pmod(Privacy.md5Raw16(col("doc_id").cast("string"), ":shard"),
      lit(S))
    val per = docs
      .select(shard.as("shard"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("ttok"),
      count(lit(1)).as("nsh"), max(col("n_tokens")).as("mx"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        round(col("mx").cast("double") * col("nsh") / col("ttok"), 6)
          .as("balance_factor"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join"      -> bloomJoin _,
    "q_sample_estimate" -> sampleEstimate _,
    "q_shard_layout"    -> shardLayout _)

  val oracles: Map[String, String] = Map(
    // the bloom filter is a lossless optimization: the oracle is the
    // plain exact join it leaves unchanged
    "q_bloom_join" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q_sample_estimate" -> {
      val raw = Privacy.sqlRaw16("CAST(o_orderkey AS VARCHAR)", ":est")
      s"""WITH s AS (SELECT o_orderpriority AS priority,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(ROUND(o_totalprice) AS BIGINT) AS dollars
        |  FROM orders WHERE $raw < $P16),
        |g AS (SELECT priority, COUNT(*) AS n_sampled,
        |    CAST(SUM(cents) AS BIGINT) AS sc,
        |    CAST(SUM(dollars * dollars) AS BIGINT) AS sq
        |  FROM s GROUP BY 1)
        |SELECT priority, n_sampled,
        |  ROUND(n_sampled / ($P16 / 65536.0), 6) AS est_orders,
        |  ROUND(sc / ($P16 / 65536.0) / 100.0, 6) AS est_revenue,
        |  ROUND(SQRT(CAST(sq AS DOUBLE) * (1.0 - $P16 / 65536.0))
        |    / ($P16 / 65536.0) * 1.96, 6) AS ci95_half
        |FROM g""".stripMargin
    },
    "q_shard_layout" -> {
      val raw = Privacy.sqlRaw16("CAST(doc_id AS VARCHAR)", ":shard")
      s"""WITH d AS (SELECT $raw % 64 AS shard,
        |    len(string_split(text, ' ')) AS nt FROM documents),
        |per AS (SELECT shard, COUNT(*) AS n_docs,
        |    CAST(SUM(nt) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ttok,
        |    COUNT(*) AS nsh, MAX(n_tokens) AS mx FROM per)
        |SELECT shard, n_docs, n_tokens,
        |  ROUND(CAST(mx AS DOUBLE) * nsh / ttok, 6) AS balance_factor
        |FROM per, tot""".stripMargin
    })
}
