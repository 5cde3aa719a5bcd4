package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SyncPipeline

/** Graph analytics over the membership graph ([[SyncPipeline.memberEdges]]:
  * the (owner, organization) editor grants the reference emits per imported
  * dataset, odgovlt.py:381). Connected components live in
  * [[graft.llm.Dedup.components]]; this adds the centrality side.
  */
object GraphOps {

  /** PageRank mass scale: ranks are integers in units of 1e-12 of the total
    * probability mass. Integer fixed-point is the determinism device: every
    * per-edge share is a BIGINT `div` (truncation — identical in any
    * engine, unlike a double division whose sum order would matter), so
    * per-node inflow sums are order-insensitive integer adds and the whole
    * fixpoint is hash-exact cross-engine.
    */
  val PrScale = 1000000000000L

  /** Fixed iteration count — rank-1 stochastic mixing on a graph this
    * connected is inside integer truncation noise well before 5 rounds.
    */
  val PrIters = 5

  /** Damping factor 0.85 as the integer pair (85, 100). */
  val PrDampNum = 85L
  val PrDampDen = 100L

  /** Fixed-point PageRank over the symmetric membership graph: nodes are
    * `u:<owner>` / `g:<organization>`, each distinct membership contributes
    * an edge in both directions (so every node has out-degree >= 1 — no
    * dangling-mass term). Per iteration each node ships
    * `(85 * (pr div deg)) div 100` along every out-edge and restarts with
    * `(15 * (Scale div n)) div 100`; all arithmetic is BIGINT `div`, so
    * the oracle (the same recurrence unrolled as chained CTEs) matches
    * hash-exact.
    *
    * Scale shape: the edge+degree table builds once and caches; each
    * iteration is one equi-join (ranks onto edges, shuffled on the node
    * key) plus one integer-sum aggregation — the same
    * O(iters) × (join + agg) loop shape as the connected-components
    * fixpoint, with map-side partial sums doing the heavy combining. The
    * rank frame stays O(nodes); at a depth where lineage growth bites,
    * a localCheckpoint per few rounds truncates it (5 unrolled rounds do
    * not need one).
    */
  def pageRank(s: SparkSession, dir: String, iters: Int = PrIters,
      cache: Boolean = true): DataFrame = {
    val m = SyncPipeline.memberEdges(s, dir)
      .select(concat(lit("u:"), col("owner_name")).as("src"),
        concat(lit("g:"), col("org_name")).as("dst"))
    // distinct (owner, org) pairs in disjoint name spaces: the two
    // directions can never collide, so the symmetric union stays dup-free
    val edges = m.union(m.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg0 = edges.join(deg, "src")
    val edgesDeg = if (cache) edgesDeg0.cache() else edgesDeg0
    val nTotal = broadcast(deg.agg(count(lit(1)).as("n")))
    val nodes0 = deg.select(col("src").as("node")).crossJoin(nTotal)
    val nodes = if (cache) nodes0.cache() else nodes0

    var pr = nodes.select(col("node"), expr(s"$PrScale div n").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edgesDeg.join(pr, edgesDeg("src") === pr("node"))
        .select(col("dst"),
          expr(s"($PrDampNum * (pr div deg)) div $PrDampDen").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("inflow"))
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left_outer")
        .select(col("node"),
          (expr(s"($PrDampDen - $PrDampNum) * ($PrScale div n) div $PrDampDen")
            + coalesce(col("inflow"), lit(0L))).as("pr"))
    }
    pr.orderBy("node")
  }
}
