package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared co-purchase-graph machinery for the graph family
  * (#106 PageRank, #123 triangle count, #136-138, #153): ONE
  * definition of the pair/edge frames and ONE degree-oriented
  * triangle enumerator, so q_triangle_count and q_edge_jaccard stop
  * maintaining (and executing) drifting copies of the same plan.
  *
  * Triangle enumeration is the compact-forward shape, but the wedge
  * step is generated ROW-LOCALLY: out-neighborhoods are collected per
  * source (the orientation bounds them at O(√m)), ordered pairs
  * explode from the sorted array — the same basket-local idiom as
  * `copurchasePairs` — and only the closure join shuffles. The
  * edge-edge SHUFFLE_HASH wedge join this replaces exchanged the
  * oriented frame twice and materialized the Σ outdeg² wedge stream
  * through a full shuffle; here the wedge stream is born partitioned
  * by source and goes through exactly one exchange (the closure key).
  * Degrees ride ALONG the enumeration (each triangle knows all three
  * endpoint degrees), so consumers that need per-edge degree context
  * (#138's Jaccard denominator) pay zero join-backs.
  */
private[graft] object GraphCore {

  /** Distinct co-purchase pairs (pa < pb) — the #106/#123 edge
    * definition, BASKET-LOCAL generation: one shuffle groups each
    * order's part set, pairs enumerate row-locally from the sorted
    * set (Σ|basket|²), then one distinct. Materialized eagerly — its
    * consumers (degrees + orientation) would otherwise each replay
    * the lineitem scan. */
  def copurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val sorted = array_sort(collect_set(col("l_partkey")))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey")).agg(sorted.as("items"))
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))),
          y => struct(x.as("pa"), y.as("pb")))))).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .distinct()
      .localCheckpoint()
  }

  /** Both directions of the undirected pair set. */
  def bidirected(pairs: DataFrame): DataFrame =
    pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))

  /** (node, deg) over the undirected graph. */
  def degrees(pairs: DataFrame): DataFrame =
    bidirected(pairs).groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))

  /** Edges oriented by the (degree, id) total order — every
    * out-neighborhood is O(√m), the skew killer on power-law graphs —
    * with BOTH endpoint degrees attached: (src, dst, degs, degd).
    * Materialized pre-partitioned on `src`, which the wedge
    * enumeration groups by (localCheckpoint preserves the plan's
    * output partitioning, so the groupBy needs no exchange). */
  def orientedDeg(pairs: DataFrame, deg: DataFrame): DataFrame = {
    val degA = deg.select(col("node").as("pa"), col("deg").as("deg_a"))
    val degB = deg.select(col("node").as("pb"), col("deg").as("deg_b"))
    pairs
      .join(degA.hint("shuffle_hash"), Seq("pa"))
      .join(degB.hint("shuffle_hash"), Seq("pb"))
      .select(
        when(col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("pa") < col("pb")),
          struct(col("pa").as("s"), col("pb").as("d"),
            col("deg_a").as("ds"), col("deg_b").as("dd")))
        .otherwise(struct(col("pb").as("s"), col("pa").as("d"),
          col("deg_b").as("ds"), col("deg_a").as("dd"))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"),
        // int degrees: deg < n_nodes by definition — halves the widest
        // shuffled columns of the wedge stream
        col("e.ds").cast("int").as("degs"), col("e.dd").cast("int").as("degd"))
      .repartition(col("src"))
      .localCheckpoint()
  }

  /** Every triangle exactly once as (a, dega, b, degb, c, degc) with
    * a → b → c in orientation order: wedges (b, c) enumerate
    * row-locally from each source's SORTED out-neighbor array (sorted
    * by the same (deg, id) key that oriented the edges, so each
    * unordered out-pair appears once, in orientation order), closed by
    * the single SHUFFLE_HASH probe b→c against the oriented frame.
    * The wedge stream is the big intermediate (Σ outdeg² rows crossing
    * the closure exchange), so it carries the MINIMUM row — (a,
    * dega:int, b, c); b's and c's degrees are recovered FROM the
    * matched oriented edge, which already stores them. */
  def triangles(oriented: DataFrame): DataFrame = {
    val nbrs = sort_array(collect_list(struct(
      col("degd").as("dg"), col("dst").as("nd"))))
    val wedges = oriented
      .groupBy(col("src").as("a"))
      .agg(first(col("degs")).as("dega"), nbrs.as("nbrs"))
      .select(col("a"), col("dega"),
        explode(flatten(transform(col("nbrs"), (x, i) =>
          transform(slice(col("nbrs"), i + 2, size(col("nbrs"))),
            y => struct(x.getField("nd").as("b"), y.getField("nd").as("c"))))))
          .as("w"))
      .select(col("a"), col("dega"), col("w.b").as("b"), col("w.c").as("c"))
    wedges.join(oriented.hint("shuffle_hash"),
        col("b") === col("src") && col("c") === col("dst"))
      .select(col("a"), col("dega"), col("b"), col("degs").as("degb"),
        col("c"), col("degd").as("degc"))
  }
}
