package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate *pairs* (LSH candidates, q21) into
  * duplicate *clusters*, so a corpus can keep exactly one canonical
  * document per group even when A~B and B~C but A!~C.
  *
  * Algorithm: every vertex starts labeled with its own id; each round
  * every vertex takes the min of its label and its neighbors' labels;
  * stop when no label changes. Converges in at most diameter(G) rounds
  * — near-dup clusters are dense (LSH links most members pairwise), so
  * 2-4 rounds in practice.
  *
  * Scale notes (100 TB): each round is one shuffle keyed on vertex id
  * (edges join labels, min-aggregate) — the classic MapReduce CC loop.
  * Labels/edges are pairs of longs; document bodies never enter the
  * computation. The driver only sees one `count()` per round for the
  * convergence check. `localCheckpoint` truncates the growing lineage
  * so round N's plan does not replay rounds 1..N-1 (on a cluster, use
  * reliable checkpointing instead if executors may be lost mid-job).
  */
object Components {

  /** Cluster assignment `(id, cluster)` for every vertex incident to an
    * edge. `edges` carries undirected edges as (srcCol, dstCol) pairs;
    * cluster = min vertex id reachable. Deterministic by construction.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    // symmetrize so one join direction sees every neighbor
    val sym = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
      .union(edges.select(col(dstCol).cast("long").as("s"),
        col(srcCol).cast("long").as("t")))
      .distinct()
      .persist()

    var labels = sym.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()

    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val nbrMin = sym.join(labels, sym("t") === labels("id"))
        .groupBy(col("s"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("s"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.label") =!= col("p.label"))
        .count()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    labels.select(col("id"), col("label").as("cluster"))
  }
}
