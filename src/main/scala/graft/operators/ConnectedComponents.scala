package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * resolution step that turns near-duplicate PAIRS (q27/q29/q40 output)
  * into duplicate GROUPS with one canonical survivor each. The
  * reference-world analogue is the "keep one per dup cluster" pass that
  * follows any LSH dedup; pairs alone under-delete (A~B, B~C must drop
  * both B and C, not just one of each pair).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every node starts labeled with the min of itself and its direct
  * neighbors; each round every node takes the min of (its label, its
  * neighbors' labels, its label's label). The last term — label
  * indirection, comp(comp(n)) — is the pointer-jumping shortcut that
  * doubles the distance a minimum travels per round, so adversarial
  * long chains converge in O(log diameter) rounds, not O(diameter).
  * Duplicate clusters are band-overlap graphs — near-cliques — so 1-2
  * rounds settle real corpora.
  *
  * Scale shape (100 TB): each round is ONE hash-shuffle join of the
  * symmetric edge list against the label table on node id, followed by
  * a map-side-combinable min-aggregation — no driver-side graph, no
  * collect. The edge list is pinned once with an eager localCheckpoint
  * (on a cluster: `Dataset.checkpoint` to reliable storage) and every
  * round's label table is checkpointed too, truncating the lineage that
  * would otherwise grow one join per round and re-execute the whole
  * prefix on every action. Convergence is detected by the sum of labels
  * (labels only ever decrease, so the sum is strictly monotone until
  * fixpoint) — one scalar action per round, summed in DECIMAL(38,0) so
  * ~2^63 node ids cannot overflow the check.
  */
object ConnectedComponents {

  /** Component label per node: (node, component) where component is the
    * MIN node id in the node's connected component. Nodes that appear
    * in no edge are absent (callers left-join and coalesce to self).
    *
    * @param edges    undirected edge list; self-loops and duplicates OK
    * @param srcCol   long-compatible source-node column name
    * @param dstCol   long-compatible destination-node column name
    * @param maxIter  safety bound on propagation rounds
    */
  def components(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(true)

    def labelSum(labels: DataFrame): java.math.BigDecimal =
      labels.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)

    // Round 0: label(n) = min(n, direct neighbors). The symmetric edge
    // list contains every node as `a`, so this covers all nodes.
    var labels = sym.groupBy("a")
      .agg(min(col("b")).as("min_nbr"))
      .select(col("a").as("node"), least(col("a"), col("min_nbr")).as("comp"))
      .localCheckpoint(true)
    var prevSum = labelSum(labels)

    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // Propagate: each node takes the min over its neighbors' labels,
      // its own, and its label's label (pointer jump — every label is
      // itself a node id, so the indirection join is total). The
      // neighbor join is total too: every node is an `a` and a `b` in
      // the symmetric list.
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy("a")
        .agg(min(col("comp")).as("nbr_comp"))
      val jump = labels
        .join(labels.select(col("node").as("comp"), col("comp").as("jump_comp")),
          "comp")
        .select(col("node").as("a"), col("comp"), col("jump_comp"))
      val next = jump
        .join(nbrMin, "a")
        .select(col("a").as("node"),
          least(col("comp"), col("nbr_comp"), col("jump_comp")).as("comp"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      labels = next
      prevSum = nextSum
      it += 1
    }
    require(converged || it < maxIter,
      s"connected components did not converge within $maxIter rounds")
    labels
  }
}
