package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Minimal distributed graph operator: connected components by iterative
  * min-label propagation — the step a dedup pipeline needs between
  * pairwise near-dup MATCHES (q33/q34/q37) and dedup GROUPS ("keep one doc
  * per cluster"). Pairs alone under-delete: A~B and B~C put A and C in one
  * cluster only through transitivity.
  *
  * Each iteration joins the symmetrized edge list against current labels
  * and keeps the per-node minimum — O(diameter) iterations of one
  * hash-shuffle each, the classic scalable formulation (label propagation
  * as in Pregel/GraphX; no driver-side graph, no quadratic closure). The
  * driver sees only the changed-row count per iteration. Near-dup graphs
  * have tiny diameters (clusters are quasi-cliques), so 3-4 iterations
  * converge; `maxIter` bounds adversarial chains. For very long chains on
  * a real cluster, `localCheckpoint` every ~10 iterations would truncate
  * the growing plan lineage — omitted here where diameters stay small.
  *
  * Input: (src, dst) pair rows. Output: (node, label) with label = min
  * node id reachable — the canonical component representative.
  */
object GraphOps {

  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(edges, maxIter)._1

  /** As [[connectedComponents]], also reporting the iteration count (for
    * convergence-rate assertions; each iteration is a fixed number of
    * driver-sequenced jobs, so iterations ARE the cost at small diameters).
    *
    * `shortcut = true` adds pointer doubling to the neighbor offers: each
    * node also adopts its label's label (one labels⋈labels self-join on
    * the O(|V|) label table — cheaper than the edge join it replaces
    * iterations of). Offers then reach distance 2^k after k rounds instead
    * of k, turning worst-case chains from O(diameter) into O(log diameter)
    * iterations. The fixpoint is unchanged — min reachable id — only the
    * route to it shortens.
    *
    * Doubling engages from iteration 3, not 1: near-dup graphs are
    * quasi-cliques that converge in 2-3 rounds, where the extra self-join
    * is pure overhead (measured +60% on the sf0.1 dedup graph with
    * doubling from round 1); graphs still unconverged by round 3 have
    * real diameter, which is exactly where doubling wins. */
  def connectedComponentsWithStats(edges: DataFrame, maxIter: Int = 50,
      shortcut: Boolean = true): (DataFrame, Int) = {
    // localCheckpoint (eager), not persist: persist short-circuits
    // recompute but the logical plan still grows by one join+agg per
    // iteration, so planning/scheduling cost compounds — measured 78 s for
    // the sf0.1 dedup graph vs ~2 s with per-iteration lineage truncation.
    // localCheckpoint blocks live on executors (lost-executor restarts the
    // job); a long-running production loop would use reliable checkpoint().
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // Convergence witness: per-node labels only ever DECREASE (min of own
    // and offered), so Σ label strictly decreases until the fixpoint and
    // "Σ unchanged" ⟺ "no node changed". The sum RIDES the checkpoint's
    // own materialization job via Dataset.observe (CollectMetrics) — the
    // former shape paid a separate tiny aggregate action per round, i.e.
    // one extra scheduler round-trip per iteration on top of the one
    // shuffle the algorithm fundamentally needs (guide §1.2: remove
    // passes before tuning inside them).
    // DECIMAL(38,0), not Long: an unchecked Long SUM over huge node ids can
    // wrap, and a wrapped-equal sum would falsely signal convergence.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, sum(col("label").cast("decimal(38,0)")).as("s"))
        .localCheckpoint()
      val v = obs.get.getOrElse("s", null)
      (ck, if (v == null) java.math.BigDecimal.ZERO // empty graph: SUM is NULL
      else v.asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      sym.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // every node offers its label to its neighbors; keep the min of
      // own and offered labels
      val offered = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      // pointer doubling: adopt label(label(node)) as well
      val withVia =
        if (!shortcut || iter < 2) labels.unionByName(offered)
        else {
          val l1 = labels.select(col("node"), col("label").as("mid"))
          val l2 = labels.select(col("node").as("mid"), col("label"))
          labels.unionByName(offered)
            .unionByName(l1.join(l2, Seq("mid")).select(col("node"), col("label")))
        }
      val (next, nextSum) = checkpointWithSum(
        withVia.groupBy(col("node")).agg(min(col("label")).as("label")))
      labels.unpersist()
      labels = next
      done = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    (labels, iter)
  }
}
