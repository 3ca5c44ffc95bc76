package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster assembly: connected components over a near-dup
  * pair set, so every document maps to the canonical (minimum) id of
  * its duplicate group — the standard final step of corpus dedup after
  * MinHash-LSH pair generation.
  *
  * Algorithm: iterative min-label propagation with label-edge doubling
  * (hash-to-min). Each round a node adopts the smallest label among
  * itself, its neighbors' labels, and its current label's label; the
  * label-edge term doubles the propagation distance per round, so
  * convergence is O(log component diameter) rounds rather than
  * O(diameter).
  *
  * Scale shape (100 TB posture): each round is one shuffle join on the
  * node id plus a partial (map-side combining) min-aggregation — no
  * all-pairs step, no driver-side collection of nodes or edges. The
  * convergence probe is a single scalar aggregate (labels are
  * monotonically non-increasing, so an unchanged label sum means a
  * fixpoint). Label sums accumulate in DECIMAL(38,0) so the probe
  * cannot overflow at any realistic node-id range.
  */
object Clusters {

  /** Connected components of the undirected graph over `nodes`
    * (column `id`) induced by `pairs` (columns `a`, `b`). Returns one
    * row per node: (id, label) with label = minimum id reachable.
    * Nodes absent from every pair keep their own id as label.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    graft.core.Checks.requireColumns(nodes, "connected_components", "id")
    graft.core.Checks.requireColumns(pairs, "connected_components",
      "a", "b")
    // the symmetrized edge view scans `pairs` twice (a->b and b->a):
    // persist the pair set so an expensive upstream pair generator
    // (LSH candidate join + verify) runs once, not twice. The count()
    // MATERIALIZES the cache before the union below ever scans it —
    // otherwise the union's two branches race through the uncached
    // plan in one job and the LSH chain executes twice.
    val p = pairs.select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    val edges = p
      .unionByName(p.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col("id"), col("id").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def labelSum(df: org.apache.spark.sql.DataFrame)
        : java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty graph -> 0
    var prevSum = labelSum(labels)

    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      // pointer-jumping edges: every node also "neighbors" its label
      val jump = labels.select(col("id").as("a"), col("label").as("b"))
      val nbrMin = edges.unionByName(jump)
        .join(labels.select(col("id").as("b"),
          col("label").as("blab")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min("blab").as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label")))
            .as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      labels.unpersist()
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
      if (debug) println(f"[cc] iter $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s converged=$converged")
    }
    p.unpersist()
    edges.unpersist()
    labels
  }
}
