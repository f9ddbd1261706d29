package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.sources.Tables

/** Shared co-purchase-graph machinery for the graph family
  * (#106 PageRank, #123 triangle count, #136-138, #153): ONE
  * definition of the edge/degree/oriented frames and ONE
  * degree-oriented triangle enumerator, so q_triangle_count and
  * q_edge_jaccard stop maintaining (and executing) drifting copies
  * of the same plan.
  *
  * HUB-SAFE BY CONSTRUCTION (the r5 verdict's one weak plan): the
  * canonical graph artifact is the distinct directed EDGE frame
  * (src, dst) — per-row aggregation state everywhere in its
  * construction is a single edge, so a 10M-degree celebrity node
  * never concentrates its neighborhood into one aggregation-buffer
  * row the way a per-node `collect_set` adjacency did. Degrees come
  * from a map-side-combined count; orientation attaches them with
  * two edge-sized joins whose BUILD side is the node-sized degree
  * frame (one int per node — bounded regardless of skew, while the
  * skewed edge stream just streams through the probe side). The ONLY
  * neighbor arrays ever materialized are the oriented OUT-neighbor
  * lists inside [[triangles]], which the (degree, id) total order
  * bounds at O(√m) — on any graph, including power-law.
  *
  * Triangle enumeration is the compact-forward shape with the wedge
  * step generated ROW-LOCALLY: out-neighborhoods are bounded at
  * O(√m) by the (degree, id) orientation, ordered pairs explode from
  * the sorted array, and the closure join is the single exchange the
  * wedge stream crosses. Before that exchange the stream is pruned by
  * a BLOOM PREFILTER over the oriented edge set (the BloomIndex
  * discipline, dedup/BloomIndex.scala): might_contain has no false
  * negatives, so dropping definite non-edges is exact — the closure
  * join then re-verifies the ~fpp survivors. At sf0.1 this cuts the
  * shuffled wedge stream from Σ outdeg² = 41M rows to ~2M (triangles
  * + false positives). The sketch is bit-capped (8 MB); past the cap
  * the fpp rises and pruning weakens gracefully — correctness never
  * depends on the sketch, only the shuffle volume does.
  */
private[graft] object GraphCore {

  /** Distinct directed co-purchase edges (src, dst) — both
    * directions, checkpointed once for every consumer. Each order's
    * sorted item set explodes ROW-LOCALLY into ordered pairs (the
    * per-order `collect_set` is bounded by basket size — a domain
    * constant, ~7 items in TPC-H — never by a node's graph degree),
    * then an edge-keyed `distinct` dedups cross-basket repeats with
    * one-edge-per-row hash-agg state. PageRank / LPA / BFS / walks
    * consume this frame directly (they attach degrees themselves or
    * not at all); the triangle family derives [[orientedOf]]. */
  def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val items = array_sort(collect_set(col("l_partkey")))
    // canonical (x < y) pairs only — the items array is sorted, so the
    // indexed slice enumerates each unordered pair once: the distinct
    // then deduplicates HALF the rows the emit-both-directions form
    // shuffled (same hash-agg state either way — one row per edge —
    // but half the exchange volume), and the mirror union after the
    // dedup is a row-local projection
    val canon = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey")).agg(items.as("items"))
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))),
          y => struct(x.as("src"), y.as("dst")))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    bidirected(canon.select(col("src").as("pa"), col("dst").as("pb")))
      .localCheckpoint()
  }

  /** Same edge-frame shape from an arbitrary canonical (pa < pb) pair
    * frame — the crafted-graph entry point for specs. */
  def edgesFromPairs(pairs: DataFrame): DataFrame =
    bidirected(pairs).distinct().localCheckpoint()

  /** Both directions of an undirected pair set. */
  def bidirected(pairs: DataFrame): DataFrame =
    pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))

  /** (node, deg: int) off the directed edge frame — a plain
    * map-side-combined count: partial state is one long per node,
    * hub-proof. */
  def degreesOf(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("int").as("deg"))

  /** The orientation kernel, lazy (no checkpoint) so plan-shape specs
    * can pin the join strategy: both endpoint degrees attach via two
    * SHUFFLE_HASH joins whose BUILD side is the node-sized `deg`
    * frame (one row per node — the hash map is degree-skew-immune;
    * a hub only lengthens the streamed probe side, which never
    * buffers). The degs join runs LAST so the result leaves the
    * kernel hash-partitioned on `src` — the wedge enumeration's
    * groupBy then needs no exchange. */
  private[graft] def orientedLazy(edges: DataFrame, deg: DataFrame): DataFrame =
    edges
      .join(deg.select(col("node").as("dst"), col("deg").as("degd"))
        .hint("shuffle_hash"), Seq("dst"))
      .join(deg.select(col("node").as("src"), col("deg").as("degs"))
        .hint("shuffle_hash"), Seq("src"))
      .filter(col("degs") < col("degd") ||
        (col("degs") === col("degd") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("degs"), col("degd"))

  /** Edges oriented by the (degree, id) total order — every
    * out-neighborhood is O(√m), the skew killer on power-law graphs —
    * with BOTH endpoint degrees attached: (src, dst, degs, degd).
    * The degree frame is checkpointed once (node-sized) and feeds
    * both joins of the kernel. */
  def orientedOf(edges: DataFrame): DataFrame =
    orientedLazy(edges, degreesOf(edges).localCheckpoint())
      .localCheckpoint()

  /** Largest edge count at which the 8 MB literal cap still buys
    * 16 bits/key (~0.05% fpp). Past this the sketch would prune too
    * weakly to pay for its Σ outdeg² probe cost — measured at 16×
    * sf0.1 (19M edges): capped-bloom fpp ≈ 19% made the closure stage
    * SLOWER than the plain explode (134s vs 91s), while under the
    * threshold the same sketch cuts it ~25%. */
  val BloomMaxEdges: Long = (1L << 26) / 16L

  /** Bloom sketch over the oriented edge identities (xxhash64 of the
    * (src, dst) pair), distributed build via the native
    * [[BloomFilterAggregate]] — 16 bits/key (~0.05% fpp). Returns
    * null when the edge set is empty (no wedges exist either) or
    * too large for the sketch to prune effectively within the 8 MB
    * literal budget ([[BloomMaxEdges]]) — the caller then keeps the
    * plain enumerate-and-join plan, whose shuffle tracks the honest
    * Σ outdeg² bound. Correctness never depends on the sketch. */
  def edgeBloom(oriented: DataFrame): Array[Byte] = {
    val n = oriented.count()
    if (n == 0L || n > BloomMaxEdges) null
    else oriented.select(GraftBridge.column(
        new BloomFilterAggregate(
          GraftBridge.expression(xxhash64(col("src"), col("dst"))),
          Literal(n, LongType),
          Literal(n * 16L, LongType))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Every triangle exactly once as (a, dega, b, degb, c, degc) with
    * a → b → c in orientation order: wedges (b, c) enumerate
    * row-locally from each source's SORTED out-neighbor array (sorted
    * by the same (deg, id) key that oriented the edges, so each
    * unordered out-pair appears once, in orientation order), pruned
    * by the edge-set bloom BEFORE the exchange, then closed by the
    * single SHUFFLE_HASH probe b→c against the oriented frame. The
    * collect_list here is the one place neighbor arrays exist, and
    * orientation bounds every group at O(√m) rows — a planted
    * celebrity hub has near-ZERO out-degree (all its edges point
    * degree-upward from the leaves). The wedge stream crossing the
    * closure exchange carries the MINIMUM row — (a, dega: int, b, c);
    * b's and c's degrees are recovered FROM the matched oriented
    * edge, which already stores them. */
  def triangles(oriented: DataFrame): DataFrame = {
    val bf = edgeBloom(oriented)
    // the bloom test runs INSIDE the wedge lambda: a wedge whose (b, c)
    // is definitely not an edge is never materialized as a struct, so
    // the explode emits only the ~2M candidates instead of all 41M
    // enumerated pairs (the post-explode filter formulation paid the
    // full struct/array allocation before dropping 95% of it). When
    // edgeBloom declines (empty or past BloomMaxEdges), the inner
    // filter is dropped entirely and the closure join alone verifies —
    // the sketch is an accelerator, never a correctness dependency.
    def inner(x: Column, i: Column): Column = {
      val rest = slice(col("nbrs"), i + 2, size(col("nbrs")))
      if (bf == null) rest
      else filter(rest, y => GraftBridge.column(new BloomFilterMightContain(
        Literal(bf, BinaryType),
        GraftBridge.expression(
          xxhash64(x.getField("nd"), y.getField("nd"))))))
    }
    val nbrs = sort_array(collect_list(struct(
      col("degd").as("dg"), col("dst").as("nd"))))
    val wedges = oriented
      .groupBy(col("src").as("a"))
      .agg(first(col("degs")).as("dega"), nbrs.as("nbrs"))
      .select(col("a"), col("dega"),
        explode(flatten(transform(col("nbrs"), (x, i) =>
          transform(inner(x, i),
            y => struct(x.getField("nd").as("b"), y.getField("nd").as("c"))))))
          .as("w"))
      .select(col("a"), col("dega"), col("w.b").as("b"), col("w.c").as("c"))
    wedges.join(oriented.hint("shuffle_hash"),
        col("b") === col("src") && col("c") === col("dst"))
      .select(col("a"), col("dega"), col("b"), col("degs").as("degb"),
        col("c"), col("degd").as("degc"))
  }
}
