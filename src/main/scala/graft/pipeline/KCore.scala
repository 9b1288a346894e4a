package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling: repeatedly delete
  * every node of degree < k (and its incident edges) until no such
  * node remains. The surviving subgraph is THE k-core — the unique
  * maximal subgraph of minimum degree ≥ k (Seidman 1983) — the
  * standard "dense nucleus" extractor for co-occurrence graphs.
  *
  * Distribution model (the [[Cluster]] recipe): each round is one
  * partial-agg degree count + two semi-joins, all partitioned by node
  * id — no global sort, no driver-side graph. Lineage is truncated
  * per round (reliable checkpoint when a checkpoint dir is set,
  * executor-local otherwise) so the plan does not deepen with rounds,
  * and convergence is decided by an exact edge COUNT (peeling only
  * removes edges, so an unchanged count ⇔ fixpoint). Rounds are
  * data-bounded: each non-final round removes ≥ 1 node, and in
  * practice peeling collapses in O(log n)-ish rounds on heavy-tailed
  * graphs; the cap fails loudly rather than returning a half-peeled
  * subgraph that is NOT a k-core.
  */
object KCore {

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)

  /** (node, core_deg) for every node of the k-core, core_deg = its
    * degree WITHIN the core (≥ k by construction).
    *
    * @param edges two-column DF of distinct undirected pairs
    *              (loCol, hiCol), no self-loops
    */
  def core(edges: DataFrame, k: Int, loCol: String, hiCol: String,
      maxRounds: Int = 64): DataFrame = {
    var sym = edges
      .select(col(loCol).as("src"), col(hiCol).as("dst"))
      .unionByName(edges.select(col(hiCol).as("src"), col(loCol).as("dst")))
      .transform(truncate)
    var prev = sym.count()
    var converged = prev == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("src")
      val next = sym.join(keep, "src")
        .join(keep.toDF("dst"), "dst")
        .select("src", "dst")
        .transform(truncate)
      val n = next.count()
      converged = n == prev
      sym.unpersist()
      sym = next
      prev = n
      round += 1
    }
    require(converged,
      s"k-core peeling did not converge in $maxRounds rounds — raise maxRounds")
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }
}
