package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked DBSCAN over 2-D integer coordinates (q343's engine).
  *
  * Density-based clustering with noise: a point is CORE when it has
  * ≥ minPts neighbors within eps (self excluded), clusters are the
  * connected components of the core-core ≤ eps graph, non-core points
  * adjacent to a core join that core's cluster (BORDER, min label when
  * several), and everything else is NOISE (cluster −1).
  *
  * THE SCALE DESIGN — reference behavior: the reference composes
  * clustering off the shelf (flink_json_to_iceberg.py routes to batch
  * engines); a native 100 TB form must never pair the corpus
  * quadratically. Cell size = eps guarantees every ≤ eps pair differs
  * by at most one cell per axis, so the left side explodes to its
  * 9-cell neighborhood and candidate pairing is a pure EQUI-join on
  * the cell key — shuffle-partitionable, AQE-skewable, never a
  * coordinate range join. Coordinates are shifted by `shift` before
  * the cell division so truncating `div` equals floor division
  * (x, y > −shift is a runtime-ENFORCED contract — an assert_true
  * inside the cell expression fails the job loudly rather than
  * misassigning cells; the default covers the ±10³ mill-scale
  * embedding contract with 100× headroom). Distance
  * verification is exact integer arithmetic; labels are component-min
  * ids via the audited [[Cluster.connectedComponents]] fixpoint, so
  * results are deterministic and engine-replayable.
  *
  * Returns (idCol, role, cluster): role 2 = core, 1 = border,
  * 0 = noise; cluster −1 for noise.
  */
object Dbscan {
  def cluster(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Long,
      minPts: Int,
      shift: Long = 100000L): DataFrame = {
    require(eps > 0 && minPts > 0, s"dbscan: eps=$eps minPts=$minPts")
    val p = points
      .select(col(idCol).as("vid"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      // the x, y > −shift contract is ENFORCED, not assumed: a
      // coordinate at or below −shift would make truncating `div`
      // diverge from floor division and silently misassign cells near
      // zero (dropping ≤ eps neighbor pairs) — assert_true keeps the
      // check inside the live cell expression (a dropped side column
      // would be pruned away by Catalyst), raising loudly scan-side
      // instead of returning a wrong clustering. Cost: one comparison
      // per row inside codegen.
      .withColumn("cx", expr(
        s"(x + $shift) div $eps + ifnull(assert_true(" +
          s"x > ${-shift}L and y > ${-shift}L, " +
          s"'dbscan: coordinate at or below -$shift breaks the " +
          "floor-division cell grid'), 0L)"))
      .withColumn("cy", expr(s"(y + $shift) div $eps"))
    val probes = p
      .select(col("vid").as("a"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
      .select(col("a"), col("ax"), col("ay"),
        (col("cx") + col("dx")).as("jcx"), col("cy"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
      .select(col("a"), col("ax"), col("ay"), col("jcx"),
        (col("cy") + col("dy")).as("jcy"))
    val nbr = probes
      .join(p.select(col("vid").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx").as("jcx"), col("cy").as("jcy")),
        Seq("jcx", "jcy"))
      .where(col("a") =!= col("b") &&
        ((col("ax") - col("bx")) * (col("ax") - col("bx"))
          + (col("ay") - col("by")) * (col("ay") - col("by")))
          <= lit(eps * eps))
      .select(col("a"), col("b"))
    val core = nbr.groupBy("a").agg(count(lit(1)).as("n"))
      .where(col("n") >= minPts.toLong).select(col("a").as("vid"))
    val coreEdges = nbr
      .join(core.select(col("vid").as("a")), "a")
      .join(core.select(col("vid").as("b")), "b")
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
    val clab = Cluster.connectedComponents(core, coreEdges, "vid", "a", "b")
    val bcand = nbr
      .join(clab.select(col("vid").as("b"), col("cluster")), "b")
      .groupBy(col("a")).agg(min("cluster").as("bcl"))
      .select(col("a").as("vid"), col("bcl"))
    p.select("vid")
      .join(clab, Seq("vid"), "left")
      .join(bcand, Seq("vid"), "left")
      .select(col("vid").as(idCol),
        when(col("cluster").isNotNull, 2L)
          .when(col("bcl").isNotNull, 1L).otherwise(0L).as("role"),
        coalesce(col("cluster"), col("bcl"), lit(-1L)).as("cluster"))
  }
}
