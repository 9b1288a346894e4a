package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a weighted directed edge table, in
  * pure INTEGER arithmetic so every engine computes bit-identical
  * ranks (reference scope: the graph-centrality member of the
  * analytics family next to q38's connected components).
  *
  * Rank mass lives in units of 1e-12 (`SCALE`): r0 = SCALE div N,
  * each iteration r'(v) = (0.15·SCALE div N) + (85 · Σ_{u→v}
  * ((r(u) div outw(u))·w(u,v))) div 100 — all `div` integral with
  * positive operands, so truncation equals floor and the DuckDB
  * oracle's `//` agrees exactly; integer sums are order-independent,
  * so any shuffle/combine order yields the same ranks (the same trick
  * q77/q103 use for log-prob sums). The per-edge rate divides BEFORE
  * multiplying by the edge weight: (r div outw)·w ≤ r never exceeds
  * SCALE, where the r·w product form would overflow int64 once edge
  * weights pass ~9e6 (real at warehouse scale); the truncation cost
  * is < 1 rank unit (1e-12) per out-unit, identical in both engines.
  * Dangling mass (nodes without out-edges) is dropped, mirrored by
  * both engines.
  *
  * Scale shape: the edge table — the only big thing — shuffles ONCE
  * (the groupBy building it) and is then joined per iteration against
  * the rank table, which is |V| rows and BROADCAST; each iteration
  * adds one partial-agg shuffle of (dst, contrib) pairs, nothing
  * else. Iteration count is fixed at plan time (bounded plan depth,
  * like q38's diameter cap). At |V| beyond broadcast range the same
  * plan runs with a shuffle join on src — contributions stay
  * integer, so the result is unchanged.
  */
object PageRank {
  val SCALE = 1000000000000L

  /** @param edges (src: long, dst: long, w: long>0) weighted edges
    * @param iters  fixed iteration count (plan-time constant)
    * @return (node: long, r: long) — rank in 1e-12 units
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pagerank needs at least one iteration")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
    // N rides along as a broadcast scalar column — no driver action
    val withN = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("__n"))))
    val ow = edges.groupBy("src").agg(sum("w").as("outw"))
    val e = edges.join(ow, "src")
    var r = withN.select(col("node"), col("__n"),
      expr(s"$SCALE div __n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(r.select(col("node").as("src"), col("r"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(r div outw) * w")).as("__s"))
      r = withN.join(contrib, Seq("node"), "left")
        .select(col("node"), col("__n"),
          (expr(s"${SCALE * 15L / 100L} div __n") +
            expr("85 * coalesce(__s, 0) div 100")).as("r"))
    }
    r.select(col("node"), col("r"))
  }

  /** Personalized PageRank: identical integer fixed point, but ALL
    * reset mass returns to the SEED set (uniform over |S|) instead of
    * the whole graph — the random-walk-with-restart relevance that
    * ranks "nodes near these seeds" (similar-item retrieval from a
    * co-occurrence graph). Same broadcast-rank plan shape; seeds ride
    * as a broadcast flag column.
    *
    * @param seeds (node: long) — the restart set; must intersect the
    *              graph (fails loudly on an empty intersection rather
    *              than emitting an all-zero vector)
    */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, "personalized pagerank needs at least one iteration")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
    val sd = seeds.select(col("node")).distinct()
      .join(nodes, "node") // seeds outside the graph carry no mass
      .withColumn("__seed", lit(1L))
    // loud failure beats an all-null rank vector (div-0 reset share)
    require(!sd.isEmpty,
      "personalized pagerank: seed set does not intersect the graph")
    val withS = nodes
      .join(broadcast(sd), Seq("node"), "left")
      .crossJoin(broadcast(sd.agg(count(lit(1)).as("__ns"))))
    val ow = edges.groupBy("src").agg(sum("w").as("outw"))
    val e = edges.join(ow, "src")
    var r = withS.select(col("node"), col("__seed"), col("__ns"),
      expr(s"case when __seed = 1 then $SCALE div __ns else 0 end").as("r"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(r.select(col("node").as("src"), col("r"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(r div outw) * w")).as("__s"))
      r = withS.join(contrib, Seq("node"), "left")
        .select(col("node"), col("__seed"), col("__ns"),
          (expr(s"case when __seed = 1 then ${SCALE * 15L / 100L} " +
            "div __ns else 0 end") +
            expr("85 * coalesce(__s, 0) div 100")).as("r"))
    }
    r.select(col("node"), col("r"))
  }
}
