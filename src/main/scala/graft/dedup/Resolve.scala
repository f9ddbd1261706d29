package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup cluster resolution: connected components over the
  * candidate-pair graph, so every document in a duplicate cluster maps
  * to ONE canonical id (the minimum doc id in its component).
  *
  * A single min-propagation hop (reference-style "keep min partner")
  * leaves chains unresolved: for edges a–b and b–c, c ends up pointing
  * at b, not a. This operator iterates min-label propagation to a
  * FIXPOINT: each round every node takes the minimum label over itself
  * and its neighbors; convergence is reached after diameter(component)
  * rounds.
  *
  * Scale design: each round is one shuffle join plus one partially-
  * aggregated groupBy — no driver-side graph state; `localCheckpoint`
  * truncates the growing lineage so round N's plan doesn't replay
  * rounds 1..N-1; the convergence probe (`isEmpty` on the changed set)
  * is a distributed short-circuit job, not a collect. Dedup components
  * are overwhelmingly tiny (pairs/triples), so the loop terminates in
  * a handful of rounds; `maxIters` bounds pathological chains.
  */
object Resolve {

  /** @param edges (src, dst) undirected candidate pairs
    * @return (id, canonical) — canonical = min node id reachable in
    *         the component; every node that appears in an edge gets a
    *         row (isolated docs are their own canonical trivially and
    *         are not emitted).
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("c", col("id"))
      .localCheckpoint()
    // min-propagation is MONOTONE (labels only ever decrease), so the
    // label sum strictly decreases until the fixpoint — comparing one
    // aggregated decimal per round is the whole convergence probe, no
    // join against the previous labels needed
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("c").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    // an empty edge set is a legitimate input (no near-dups found):
    // sum over zero rows is null, and there is nothing to propagate
    if (prevSum == null) return labels
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighbor labels: for every edge src->dst, src can adopt dst's label
      val nbr = bidir.join(labels, bidir("dst") === labels("id"))
        .select(bidir("src").as("id"), col("c"))
      val propagated = labels.unionByName(nbr)
        .groupBy(col("id")).agg(min(col("c")).as("c"))
      // POINTER DOUBLING: each node also jumps to its label's label
      // (path halving), so convergence is O(log diameter) rounds
      // instead of O(diameter) — a 1000-link chain resolves in ~10
      // rounds, not 1000
      val jumpMap = propagated
        .withColumnRenamed("id", "jc").withColumnRenamed("c", "cc")
      val next = propagated
        .join(jumpMap, col("c") === col("jc"), "left")
        .select(col("id"), least(col("c"), coalesce(col("cc"), col("c"))).as("c"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
  }
}
