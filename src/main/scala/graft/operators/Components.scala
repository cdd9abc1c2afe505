package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Connected components — the step that turns near-duplicate *pairs*
  * (LSH candidates, q21) into duplicate *clusters*, so a corpus keeps
  * exactly one canonical document per group even when A~B and B~C but
  * A!~C.
  *
  * Algorithm: repeated partition-local union-find ("local contraction").
  * Each pass shuffles the symmetrized edge set by source vertex — so a
  * vertex's ENTIRE neighborhood lands in one partition — runs an
  * in-memory union-find per partition, and re-emits each local
  * component as a star around its minimum id. Fragments of one true
  * component share vertices across partitions, so stars merge on the
  * next pass; long chains collapse wholesale inside partitions rather
  * than one hop per round, giving convergence in 2-4 passes where
  * plain min-label propagation needs O(diameter) rounds.
  *
  * Convergence check: stop when the label map (min star target per
  * vertex) is unchanged by a pass. Sound because every edge (x,y) puts
  * x and y into the same partition-local component of partition(x): an
  * unchanged label map means labels were already constant across every
  * edge, i.e. constant per true component — and the constant is the
  * component min, since the min vertex labels itself.
  *
  * Change DETECTION is accumulator-based, not join-based: each vertex's
  * label is monotonically non-increasing across passes (a pass relabels
  * x to the min of its merged local components, which include x's
  * current label) and the vertex set is constant, so the label SUM
  * strictly decreases until the fixed point. The sum is captured by a
  * LongAccumulator folded into the pass's label materialization — no
  * extra per-pass comparison job. Because accumulator updates can in
  * principle double-count under task retry, sum-equality is treated as
  * a fixed-point CANDIDATE and confirmed by the exact join check — one
  * extra job per run (on the final pass), not one per pass.
  *
  * Scale notes (100 TB): one shuffle of (long, long) pairs per pass;
  * document bodies never enter the computation. Per-partition state is
  * a hash map over the vertices of that partition — size
  * `spark.sql.shuffle.partitions` so a partition's edges fit in task
  * memory. Intermediate fragment labels depend on the partitioning,
  * but the fixed point (component-min labels) does not.
  * Lineage is truncated between passes: `localCheckpoint` by default,
  * or reliable `checkpoint` (survives executor loss) via the
  * `reliableCheckpoint` parameter.
  */
object Components {

  /** One local-contraction pass: union-find per partition, emit each
    * local component as a min-rooted star (both edge directions, plus a
    * self-loop on the root so labels stay defined for root vertices).
    */
  private def contract(e: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import e.sparkSession.implicits._
    e.repartition(col("_1")).mapPartitions { it =>
      val parent = new java.util.HashMap[Long, Long]()
      def findRoot(a: Long): Long = {
        var r = a
        while (parent.get(r) != r) r = parent.get(r)
        var c = a // path compression
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      it.foreach { case (s, t) =>
        if (!parent.containsKey(s)) parent.put(s, s)
        if (!parent.containsKey(t)) parent.put(t, t)
        val rs = findRoot(s)
        val rt = findRoot(t)
        // union-to-min: the root of every tree is its component minimum
        if (rs < rt) parent.put(rt, rs)
        else if (rt < rs) parent.put(rs, rt)
      }
      val out = Seq.newBuilder[(Long, Long)]
      parent.keySet.forEach { x =>
        val m = findRoot(x)
        if (x == m) out += ((m, m))
        else {
          out += ((x, m))
          out += ((m, x))
        }
      }
      out.result().iterator
    }
  }

  /** Min star target per vertex — the current label map. */
  private def labelsOf(e: Dataset[(Long, Long)]): DataFrame =
    e.toDF("s", "t").groupBy(col("s")).agg(min(col("t")).as("t_min"))
      .select(col("s").as("id"), least(col("t_min"), col("s")).as("label"))

  /** Cluster assignment `(id, cluster)` for every vertex incident to an
    * edge. `edges` carries undirected edges as (srcCol, dstCol) pairs;
    * cluster = min vertex id reachable. Deterministic by construction.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50,
                          reliableCheckpoint: Boolean = false): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    val spark = edges.sparkSession
    import spark.implicits._
    // localCheckpoint stores blocks on executors: lineage-truncating and
    // cheap, but a lost executor loses blocks that can no longer be
    // recomputed — fine on local[n], fatal on a preemptible cluster.
    // reliableCheckpoint=true writes each pass to the (HDFS/S3)
    // checkpoint dir instead, surviving executor loss at the cost of a
    // persisted write per pass.
    if (reliableCheckpoint)
      require(spark.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint=true requires sparkContext.setCheckpointDir")
    def ckpt[T](ds: Dataset[T]): Dataset[T] =
      if (reliableCheckpoint) ds.checkpoint() else ds.localCheckpoint()

    // exact per-vertex fixed-point check: true iff no label moved
    def unchanged(next: DataFrame, prev: DataFrame): Boolean = next
      .join(prev.select(col("id").as("pid"), col("label").as("plabel")),
        col("id") === col("pid"))
      .filter(col("label") =!= col("plabel"))
      .limit(1).count() == 0

    // materialize a pass's labels while summing them into an
    // accumulator — the sum rides the checkpoint job for free
    def labelsWithSum(e: Dataset[(Long, Long)]): (DataFrame, Long) = {
      val acc = spark.sparkContext.longAccumulator("graft.cc.labelSum")
      val out = ckpt(labelsOf(e).as[(Long, Long)]
        .mapPartitions(_.map { case (id, l) => acc.add(l); (id, l) })
        .toDF("id", "label"))
      (out, acc.value)
    }

    // symmetrize in one flat pass and materialize, so the (possibly
    // expensive) upstream pair pipeline runs exactly once; duplicate
    // edges are harmless to union-find, so no dedup shuffle
    var e = ckpt(edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
      .as[(Long, Long)]
      .flatMap { case (s, t) => Iterator((s, t), (t, s)) })
    var (labels, prevSum) = labelsWithSum(e)

    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      e = ckpt(contract(e))
      val (next, nextSum) = labelsWithSum(e)
      // candidate fixed point: labels are monotone non-increasing, so
      // absent accumulator noise the sum strictly decreases until the
      // fixed point. >= (not ==) because speculative/retried tasks can
      // only INFLATE a pass's sum — at a true fixed point the inflated
      // nextSum may persistently exceed prevSum, and gating on equality
      // alone would spin to maxIter despite having converged. Healthy
      // mid-run passes strictly decrease, so the exact join check still
      // runs ~once per call, not once per pass. The final allowed pass
      // ALWAYS runs the exact check: an inflated previous sum can mask
      // a fixed point (clean nextSum < inflated prevSum with labels
      // unchanged), and non-convergence must never be declared on the
      // noisy signal alone.
      if (nextSum >= prevSum || rounds == maxIter - 1)
        converged = unchanged(next, labels)
      labels = next
      prevSum = nextSum
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Measure-then-choose components (the Skew.planJoin / q170-lowDup
    * discipline applied to the cluster build): dedup-pair graphs are
    * EDGE-sparse relative to the corpus — near-dup pairs at production
    * thresholds are a sliver of doc count — so most runs' component
    * graphs fit a driver union-find, where the whole fixed point costs
    * ONE bounded collect instead of 2–4 distributed contraction passes
    * × several jobs each (measured: the sf0.1 canon-comps artifact
    * build dropped from ~20 s of loop overhead for an 8-edge graph).
    * The probe is a LIMIT-bounded count on the (usually already
    * persisted) edge frame; past `driverCap` edges it falls back to
    * the distributed loop — same labels either way (component-min,
    * deterministic), asserted equal by ComponentsSpec.
    */
  def connectedComponentsAuto(edges: DataFrame, srcCol: String,
                              dstCol: String, maxIter: Int = 50,
                              reliableCheckpoint: Boolean = false,
                              driverCap: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
    // two-step bounded probe (ADVICE r10): a LIMIT-bounded COUNT
    // decides the branch before any row is fetched — the old probe
    // collected up to driverCap+1 = 2,000,001 tuples (plus the boxed
    // HashMap built on top, a few hundred MB of driver heap at the cap
    // boundary) even when the distributed fallback was about to be
    // chosen at cap+2 edges. One extra small job buys bounded driver
    // memory; the count is cheap (LocalLimit short-circuits the scan).
    val probed = pairs.limit(driverCap + 1).count()
    if (probed > driverCap)
      connectedComponents(edges, srcCol, dstCol, maxIter,
        reliableCheckpoint)
    else {
      val sample = pairs.as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def findRoot(a: Long): Long = {
        var r = a
        while (parent.get(r) != r) r = parent.get(r)
        var c = a
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      sample.foreach { case (s, t) =>
        if (!parent.containsKey(s)) parent.put(s, s)
        if (!parent.containsKey(t)) parent.put(t, t)
        val rs = findRoot(s)
        val rt = findRoot(t)
        if (rs < rt) parent.put(rt, rs)
        else if (rt < rs) parent.put(rs, rt)
      }
      val out = Seq.newBuilder[(Long, Long)]
      parent.keySet.forEach(x => out += ((x, findRoot(x))))
      spark.createDataFrame(out.result()).toDF("id", "cluster")
    }
  }
}
