package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by hash-min label propagation — the
  * reusable cluster-formation step behind density clustering
  * ([[graft.operators.Clustering.clDbscan]]) and any dup-graph
  * canonicalization: every node starts labeled with itself, and each
  * round replaces a node's label with the minimum over itself and its
  * neighbors until no label changes. The fixpoint labels each component
  * by its MINIMUM node id — a deterministic canonical representative.
  *
  * Scale contract: per round ONE keyed join (edges × labels) + ONE
  * partial-agged min — both AQE-skew-splittable shapes; the driver
  * carries only a changed-row COUNT per round (a scalar action, never
  * data). Rounds = graph diameter. That is the right trade for the
  * similarity/dup graphs this engine builds (dense near-dup clusters:
  * diameter 2–3, so 2–4 rounds); a long-chain graph (diameter ~n) wants
  * the large-star/small-star contraction (Kiveris et al. 2014) instead —
  * documented so the caller chooses consciously, not silently. Label
  * frames are |nodes|-row and localCheckpoint-pinned each round to cut
  * the iterative lineage (the cl_pagerank idiom); the edge frame should
  * arrive pinned if the caller derived it expensively. */
object ConnectedComponents {

  /** Label every node in `nodes` (single column `node`) with the minimum
    * node id reachable through `edges` (columns `a`, `b`; treated as
    * DIRECTED a→b messages — pass both directions for an undirected
    * graph, as [[symmetrize]] does). Nodes absent from `edges` keep
    * their own id (singleton components). Returns (node, component). */
  def labels(nodes: DataFrame, edges: DataFrame): DataFrame = {
    var lbl = nodes.select(col("node"), col("node").as("lbl")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val msgs = edges.join(lbl.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), col("lbl"))
      val merged = lbl.unionByName(msgs)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      changed = merged.join(lbl.withColumnRenamed("lbl", "prev"), "node")
        .filter(col("lbl") < col("prev")).count()
      lbl = merged
    }
    lbl.withColumnRenamed("lbl", "component")
  }

  /** Both directions of an undirected pair list (columns `u`, `v`). */
  def symmetrize(pairs: DataFrame, u: String, v: String): DataFrame =
    pairs.select(col(u).as("a"), col(v).as("b"))
      .union(pairs.select(col(v).as("a"), col(u).as("b")))
}
