package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Recommendation batch (SURVEY §2 #134-135): association rules with
  * support/confidence/lift (#134) and item-item top-N co-occurrence
  * recommendations (#135) — the market-basket surface on the
  * co-purchase data the graph queries (#106, #123) already mine.
  */
object Recommend {

  /** Per-order sorted item sets — the shared input of both queries;
    * ONE shuffle groups the baskets, materialized ONCE (its three
    * consumers — order count, item counts, pair enumeration — would
    * otherwise each replay the scan+group). Pair enumeration is then
    * ROW-LOCAL on the sorted set (the basket-local Σ|basket|² shape)
    * instead of a basket self-join, which would exchange the item
    * table twice more for the same pair stream. */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
      .localCheckpoint()

  /** #134 ASSOCIATION RULES — pairwise rules a→b with support,
    * confidence and lift over order baskets, kept above a minimum
    * support count (the Agrawal/Srikant 2-itemset core; 2-itemsets
    * are the scale-honest cut — k-itemset growth is combinatorial
    * and production basket engines mine pairs first).
    *
    * Scale shape: per-order pair enumeration is bucket-local (the
    * order is the bucket — the same Σ|basket|² bound as SemDeDup's
    * clusters); item and pair counts are map-side-combined aggs;
    * the rule join attaches two item counts to each surviving pair
    * via SHUFFLE_HASH on the item key; the order count is ONE
    * broadcast scalar. Rules are emitted in both directions from
    * the one canonical pair count. */
  def assocRules(s: SparkSession, dir: String, minPairCount: Long = 3): DataFrame = {
    val b = baskets(s, dir)
    val nOrders = b.agg(count(lit(1)).as("n_orders"))
    val itemCnt = b.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("item_cnt"))
    // pair enumeration as two Generates (posexplode + explode of the
    // strictly-later tail): array-lambda HOFs run interpreted
    // (CodegenFallback) — the Generate shape keeps the Σ|basket|²
    // enumeration inside whole-stage codegen (same pairs; the r13
    // GraphCore rewrite measured the pattern 2.5x on the wedge stream)
    val pairCnt = b
      .select(col("items"), posexplode(col("items")))
      .select(col("col").as("pa"),
        explode(slice(col("items"), col("pos") + 2,
          greatest(size(col("items")) - col("pos") - 1, lit(0)))).as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairCount)
    // both rule directions from the canonical a<b pair
    val rules = pairCnt.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("pair_cnt"))
      .unionByName(pairCnt.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("pair_cnt")))
    rules
      .join(itemCnt.withColumnRenamed("item", "antecedent")
        .withColumnRenamed("item_cnt", "ante_cnt").hint("shuffle_hash"), Seq("antecedent"))
      .join(itemCnt.withColumnRenamed("item", "consequent")
        .withColumnRenamed("item_cnt", "cons_cnt").hint("shuffle_hash"), Seq("consequent"))
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("pair_cnt"),
        round(col("pair_cnt").cast("double") / col("n_orders"), 6).as("support"),
        round(col("pair_cnt").cast("double") / col("ante_cnt"), 6).as("confidence"),
        round(col("pair_cnt").cast("double") * col("n_orders")
          / (col("ante_cnt").cast("double") * col("cons_cnt")), 6).as("lift"))
  }

  /** #135 ITEM-ITEM TOP-N RECOMMENDATIONS — for each part, the 3
    * most-lifted co-purchased parts (lift > 1 only: co-occurrence
    * above independence), rank tie-broken on the item id: the
    * "customers also bought" readout materialized as a table.
    *
    * Scale shape: rides #134's bucket-local pair counts; the top-3
    * cut is a per-antecedent window over the already-aggregated
    * rule frame (pair-count-sized, not corpus-sized). */
  def itemRecs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("antecedent"))
      .orderBy(col("lift").desc, col("consequent"))
    assocRules(s, dir)
      .filter(col("lift") > 1.0)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("antecedent"), col("rank"), col("consequent"),
        col("pair_cnt"), col("lift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> ((s: SparkSession, dir: String) => assocRules(s, dir)),
    "q_item_recs"   -> itemRecs _
  )

  private val rulesCte =
    """b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
      |ic AS (SELECT l_partkey AS item, COUNT(*) AS item_cnt FROM b GROUP BY 1),
      |pc AS (
      |  SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS pair_cnt
      |  FROM b x JOIN b y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |rules AS (
      |  SELECT pa AS antecedent, pb AS consequent, pair_cnt FROM pc
      |  UNION ALL
      |  SELECT pb, pa, pair_cnt FROM pc),
      |scored AS (
      |  SELECT r.antecedent, r.consequent, r.pair_cnt,
      |    ROUND(CAST(r.pair_cnt AS DOUBLE) / n.n_orders, 6) AS support,
      |    ROUND(CAST(r.pair_cnt AS DOUBLE) / a.item_cnt, 6) AS confidence,
      |    ROUND(CAST(r.pair_cnt AS DOUBLE) * n.n_orders
      |      / (CAST(a.item_cnt AS DOUBLE) * c.item_cnt), 6) AS lift
      |  FROM rules r
      |  JOIN ic a ON a.item = r.antecedent
      |  JOIN ic c ON c.item = r.consequent, n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_assoc_rules" ->
      s"""WITH $rulesCte
        |SELECT antecedent, consequent, pair_cnt, support, confidence, lift
        |FROM scored""".stripMargin,
    "q_item_recs" ->
      s"""WITH $rulesCte,
        |ranked AS (
        |  SELECT antecedent, consequent, pair_cnt, lift,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY antecedent ORDER BY lift DESC, consequent) AS BIGINT) AS rank
        |  FROM scored WHERE lift > 1.0)
        |SELECT antecedent, rank, consequent, pair_cnt, lift
        |FROM ranked WHERE rank <= 3""".stripMargin
  )
}
