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
  * data). Rounds = graph diameter for plain [[labels]] — the right
  * trade for the similarity/dup graphs this engine builds (dense
  * near-dup clusters: diameter 2–3, so 2–4 rounds); for graphs that may
  * carry long chains, [[labelsJumped]] adds pointer jumping for
  * O(log diameter) rounds (the same contraction goal as Kiveris et
  * al. 2014's large-star/small-star, in one extra keyed join). Label
  * frames are |nodes|-row and localCheckpoint-pinned each round to cut
  * the iterative lineage (the cl_pagerank idiom); the edge frame should
  * arrive pinned if the caller derived it expensively. */
object ConnectedComponents {

  /** Label every node in `nodes` (single column `node`) with the minimum
    * node id reachable through `edges` (columns `a`, `b`; treated as
    * DIRECTED a→b messages — pass both directions for an undirected
    * graph, as [[symmetrize]] does). Nodes absent from `edges` keep
    * their own id (singleton components). Returns (node, component). */
  def labels(nodes: DataFrame, edges: DataFrame): DataFrame =
    run(nodes, edges, jump = false)._1

  /** [[labels]] with pointer jumping: each round also folds in the label
    * OF the label (`L(u) ← min(L(u), L(L(u)))` — one extra self-join +
    * the same partial-agged min), which contracts label chains
    * geometrically: O(log diameter) rounds instead of O(diameter). Use
    * for graphs that may carry long chains (lineage graphs, session
    * stitching); plain [[labels]] stays the cheaper-per-round choice for
    * dense similarity/dup clusters whose diameter is already 2–3. A
    * label is always some node's CURRENT id (labels start as ids and
    * only adopt smaller seen ids), so the jump join is total. */
  def labelsJumped(nodes: DataFrame, edges: DataFrame): DataFrame =
    run(nodes, edges, jump = true)._1

  /** Shared fixpoint loop; returns (labels, rounds) — rounds surfaced so
    * the spec can pin the geometric contraction, not just the answer. */
  private[plans] def run(nodes: DataFrame, edges: DataFrame,
                         jump: Boolean): (DataFrame, Int) = {
    // the big edge relation exchanges ONCE onto the per-round join key;
    // every round's edges⋈labels join then shuffles only the label side
    // (the dd_dup_groups discipline — without this the corpus-scale edge
    // frame re-exchanges every round)
    val e = edges.repartition(col("a")).cache()
    try {
      var lbl = nodes.select(col("node"), col("node").as("lbl")).localCheckpoint()
      // the actual checkpointed frame behind `lbl` (lbl itself may be a
      // projection of it; the unpersist shim needs the LogicalRDD leaf)
      var pinned = lbl
      var changed = 1L
      var rounds = 0
      while (changed > 0) {
        // pointer jumping contracts chains geometrically: 64 jumped
        // rounds would mean a diameter beyond 2^64 — a real bug, say so
        // (plain hash-min legitimately takes diameter rounds; no cap)
        if (jump && rounds >= 64) throw new IllegalStateException(
          s"ConnectedComponents: pointer-jumped propagation not converged after $rounds rounds")
        // round-15 optimization (guide §2.4): the old label rides the
        // union as a `prev` column (every node contributes exactly one
        // base row, so max(prev) over the group IS its previous label),
        // which turns the per-round convergence probe from a
        // merged⋈lbl join + shuffle into a filter-count over the frame
        // just checkpointed — one exchange and one |nodes|-row scan
        // fewer per round, labels bit-identical.
        val base = lbl.withColumn("prev", col("lbl"))
        val msgs = e.join(lbl.withColumnRenamed("node", "a"), "a")
          .select(col("b").as("node"), col("lbl"),
            lit(null).cast(base.schema("prev").dataType).as("prev"))
        val jumped = if (!jump) Seq.empty[DataFrame] else Seq(
          lbl.join(
            lbl.select(col("node").as("__j"), col("lbl").as("__jl")),
            col("lbl") === col("__j"))
            .select(col("node"), col("__jl").as("lbl"),
              lit(null).cast(base.schema("prev").dataType).as("prev")))
        val merged = (Seq(base, msgs) ++ jumped).reduce(_ unionByName _)
          .groupBy(col("node")).agg(min(col("lbl")).as("lbl"),
            max(col("prev")).as("prev"))
          .localCheckpoint()
        changed = merged.filter(col("lbl") < col("prev")).count()
        // release the superseded round's |nodes|-row checkpoint blocks
        // now, not when GC + ContextCleaner get to them — a long-diameter
        // run would otherwise stack rounds × |nodes| blocks in executor
        // storage (the Dedup.distributedMinLabel discipline)
        org.apache.spark.sql.GraftShim.unpersistLocalCheckpoint(pinned)
        pinned = merged
        lbl = merged.select(col("node"), col("lbl"))
        rounds += 1
      }
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc-debug] jump=$jump rounds=$rounds")
      (lbl.withColumnRenamed("lbl", "component"), rounds)
    } finally e.unpersist(false) // the returned labels are a checkpointed RDD
  }

  /** Both directions of an undirected pair list (columns `u`, `v`). */
  def symmetrize(pairs: DataFrame, u: String, v: String): DataFrame =
    pairs.select(col(u).as("a"), col(v).as("b"))
      .union(pairs.select(col(v).as("a"), col(u).as("b")))
}
