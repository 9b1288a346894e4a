package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over a pair graph.
  *
  * Pairwise near-dup detection ([[NearDup]]) yields edges; real corpus
  * curation needs the transitive closure — if A~B and B~C, then
  * {A,B,C} is ONE duplicate cluster and exactly one survivor should be
  * kept. This computes, for every node, the minimum node id reachable
  * through the pair graph (the canonical cluster label).
  *
  * Scale design: iterative min-label propagation. Each round is one
  * hash-shuffle join of the (bounded) edge list against current labels
  * plus a `groupBy(id).agg(min(lbl))` — partial aggregation applies,
  * nothing is ever collected to the driver, and no all-pairs product
  * exists anywhere. Rounds needed = the maximum cluster DIAMETER (not
  * size): label information travels one hop per round. Dup clusters in
  * practice are shallow (most are cliques from a shared fingerprint —
  * diameter 1-2), so the loop converges in a handful of rounds; the
  * convergence check is a monotone aggregate (labels only ever
  * decrease, so an unchanged global sum ⇔ fixpoint) — one count-free
  * scalar job per round. Lineage is truncated every round so the plan
  * does not grow with iterations: through the RELIABLE checkpoint dir
  * when `sparkContext.setCheckpointDir` is configured (survives
  * executor loss — set it on a real cluster), falling back to
  * `localCheckpoint` (executor-local blocks, fine for single-JVM runs).
  */
object Cluster {

  /** Truncate lineage: reliable checkpoint if a checkpoint dir is
    * configured, executor-local otherwise. Superseded rounds are
    * unpersisted as the loop advances; reliable checkpoint FILES are
    * reclaimed by Spark's context cleaner — set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` on long
    * driver processes so per-round checkpoints do not accumulate for
    * the application's lifetime.
    */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)

  /** (id, cluster) for every node, cluster = min id in its component.
    *
    * @param nodes single-column DF of node ids (name = idCol); nodes
    *              absent from `edges` come back as their own cluster.
    *              Edge endpoints missing from `nodes` still take part
    *              in propagation (label information flows THROUGH
    *              them) but are excluded from the output.
    * @param edges two-column DF of undirected pairs (srcCol, dstCol)
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    // symmetrize once: propagation below only pushes src -> dst
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .transform(truncate)
    // propagate over nodes ∪ edge endpoints: an endpoint absent from
    // `nodes` entering the label table mid-flight would (a) carry
    // labels incorrectly and (b) be able to offset another label's
    // decrease in the convergence sum — false convergence
    val universe = nodes.select(col(idCol).as("id"))
      .unionByName(sym.select(col("src").as("id")))
      .distinct()

    // decimal(38), not long: at extreme node-count × id-range scale a
    // long sum can wrap, and a wrapped sum colliding with the previous
    // one would silently declare FALSE convergence
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("s")).head().getDecimal(0)

    var labels = universe.select(col("id"), col("id").as("lbl"))
      .transform(truncate)
    var current = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // push each node's label to its neighbors, keep the min seen
      val pushed = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.unionByName(pushed)
        .groupBy("id")
        .agg(min("lbl").as("lbl"))
        .transform(truncate)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(current) == 0 // labels only decrease
      labels.unpersist() // superseded round: release its blocks now
      labels = next
      current = nextSum
      round += 1
    }
    // an unconverged assignment is WRONG (some labels not yet minimal)
    // — fail loudly rather than hand back silently-split clusters
    require(converged,
      s"connected components did not converge in $maxRounds rounds — " +
        "a component with diameter beyond the budget exists; raise maxRounds")
    labels
      .join(nodes.select(col(idCol).as("id")).distinct(), "id")
      .select(col("id").as(idCol), col("lbl").as("cluster"))
  }

  /** One survivor per near-dup cluster: the member whose id equals the
    * cluster label (i.e. the minimum id — same survivorship rule as
    * [[Dedup.exact]], lifted from fingerprint groups to transitive
    * near-dup components).
    */
  def survivors(assignment: DataFrame, idCol: String): DataFrame =
    assignment.where(col(idCol) === col("cluster")).select(idCol)

  /** Single-source BFS hop distances over an undirected edge list —
    * the reachability/shortest-hops primitive next to
    * [[connectedComponents]] (same propagation engine: one bounded
    * edge⋈label shuffle + one partial-agg min per round; rounds =
    * the source's ECCENTRICITY, not graph size; lineage truncated
    * per round). Unreachable nodes come back with a null `hop`.
    * Convergence is the same monotone-sum rule: hops only ever
    * decrease (unknown = a sentinel above any real distance, valid
    * while rounds < sentinel), so an unchanged sum ⇔ fixpoint.
    */
  def bfsHops(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      srcCol: String,
      dstCol: String,
      sourceId: Long,
      maxRounds: Int = 50): DataFrame = {
    val Unreached = 1000000000L // sentinel > any real hop count
    require(maxRounds < Unreached, "round budget must stay below the sentinel")
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .transform(truncate)
    val universe = nodes.select(col(idCol).as("id"))
      .unionByName(sym.select(col("src").as("id")))
      .distinct()

    def hopSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("hop").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("s")).head().getDecimal(0)

    var labels = universe
      .select(col("id"),
        when(col("id") === sourceId, 0L).otherwise(Unreached).as("hop"))
      .transform(truncate)
    var current = hopSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val pushed = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), (col("hop") + 1L).as("hop"))
      val next = labels.unionByName(pushed)
        .groupBy("id")
        .agg(min("hop").as("hop"))
        .transform(truncate)
      val nextSum = hopSum(next)
      converged = nextSum.compareTo(current) == 0
      labels.unpersist()
      labels = next
      current = nextSum
      round += 1
    }
    require(converged,
      s"BFS did not converge in $maxRounds rounds — a reachable node " +
        "beyond the budget exists; raise maxRounds")
    labels
      .join(nodes.select(col(idCol).as("id")).distinct(), "id")
      .select(col("id").as(idCol),
        when(col("hop") === Unreached, lit(null).cast("long"))
          .otherwise(col("hop")).as("hop"))
  }
}
