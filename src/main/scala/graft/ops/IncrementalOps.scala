package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{table => t}

/** Incremental view maintenance — the batch half of §2.9's incremental
  * story (the streaming half is `StreamOps`; incremental DEDUP is
  * [[graft.llm.Dedup.incrementalDedup]]): a materialized aggregate updates
  * from a delta batch by merging O(groups) STATE, never rescanning the
  * base facts. The operator exists to pin the algebra that makes this
  * sound: (count, sum) is a commutative monoid — `avg` is NOT mergeable,
  * `(n, Σ)` is, and `avg` derives at read time.
  */
object IncrementalOps {

  /** Every tenth event (by id) arrives in the delta batch; the rest are
    * the materialized base — the [[graft.llm.Dedup.IncrementModulus]]
    * convention for modeling an incremental run on a static fixture.
    */
  val DeltaModulus = 10

  /** Per-type event stats maintained incrementally: the base's aggregate
    * state and the delta's aggregate state merge by integer addition —
    * one O(groups)-sized union + re-aggregation, identical to the full
    * recompute BY THE MONOID LAWS, which is exactly what the oracle
    * (a plain GROUP BY over all events) certifies. Money rides as integer
    * cents (order-insensitive sums); `avg_cents` derives from the merged
    * `(n, Σ)` as one division of two exact integers.
    *
    * Scale shape: in production the base state is a persisted O(groups)
    * table (here derived in-query from the id split, the
    * incrementalDedup convention) — so maintaining the view over a
    * 100 TB history costs one scan of the DELTA plus a merge of two
    * group-sized states; the history is never touched again.
    */
  def ivmMergeAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    def state(part: DataFrame): DataFrame = part
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val base = state(ev.filter(col("event_id") % DeltaModulus =!= 0))
    val delta = state(ev.filter(col("event_id") % DeltaModulus === 0))
    base.union(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("s")).as("sum_cents"))
      .select(col("event_type"), col("n_events"), col("sum_cents"),
        round(col("sum_cents") / col("n_events"), 4).as("avg_cents"))
      .orderBy("event_type")
  }

  /** Incremental maintenance of a DISTINCT-COUNT view through KMV
    * sketches — what [[ivmMergeAgg]]'s monoid rule cannot do (distinct
    * counts don't add), solved the way a 100 TB pipeline solves it: the
    * per-group KMV sketch IS mergeable ([[graft.llm.Sketches.kmvUnion]]
    * — the k smallest of two sketches' union is EXACTLY the union's
    * sketch, an identity, not an approximation), so yesterday's persisted
    * sketch absorbs today's delta without rescanning either side.
    * Output per event_type: the merged sketch's scalars and estimate
    * beside the exact distinct count over base∪delta — merged ≡ rebuilt
    * is the oracle contract (the ivm family's proof shape), and the
    * exact column is the one you delete at scale.
    *
    * Scale shape: base and delta each reduce to k longs per group; the
    * merge is row-local array algebra on the O(groups) frame.
    */
  def ivmSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.Sketches
    import graft.functions.KMinValues
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        Sketches.kmvHash(col("user_id")).as("h"), col("user_id"))
    def sketch(part: DataFrame): DataFrame = part
      .groupBy(col("event_type"))
      .agg(KMinValues(col("h"), Sketches.KmvK).as("kmv"))
    val base = sketch(ev.filter(col("event_id") % DeltaModulus =!= 0))
      .withColumnRenamed("kmv", "kmv_base")
    val delta = sketch(ev.filter(col("event_id") % DeltaModulus === 0))
      .withColumnRenamed("kmv", "kmv_delta")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    // full outer: a group may exist only in the delta (or only the base)
    val merged = base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        Sketches.kmvUnion(
          coalesce(col("kmv_base"), array().cast("array<bigint>")),
          coalesce(col("kmv_delta"), array().cast("array<bigint>")))
          .as("kmv"))
    merged.join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"),
        size(col("kmv")).as("n_hashes"),
        element_at(col("kmv"), size(col("kmv"))).as("max_hash"),
        Sketches.kmvEstimate(col("kmv")).as("est_distinct"),
        col("exact_distinct"))
      .orderBy("event_type")
  }

  /** Delta split for the join view's dimension side (coprime to
    * [[DeltaModulus]] so the two deltas overlap on some rows — the
    * ΔR⋈ΔS term is genuinely exercised, not vacuously empty).
    */
  val DimDeltaModulus = 11

  /** Incremental maintenance of a JOIN view by the delta rules:
    * for V = R ⋈ S with arriving deltas,
    * `ΔV = ΔR⋈S_old ∪ R_old⋈ΔS ∪ ΔR⋈ΔS` — the inclusion-exclusion
    * expansion whose three terms each touch at most one full side. The
    * query materializes `V_new = V_old ∪ ΔV` via that expansion and the
    * oracle recomputes `(R_old∪ΔR) ⋈ (S_old∪ΔS)` flat — equality IS the
    * delta-rule soundness proof, checked hash-exact cross-engine.
    *
    * Scale shape: in production V_old is a persisted table (here the
    * base⋈base term stands in, the incrementalDedup convention), so an
    * update costs |ΔR|·(join against S) + |ΔS|·(join against R) + the
    * tiny ΔR⋈ΔS — never a rescan of V. The delta-side joins broadcast
    * when deltas are small (the common case); all four terms share the
    * customer-key partitioning.
    */
  def ivmJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    val (oBase, oDelta) = (o.filter(col("o_orderkey") % DeltaModulus =!= 0),
      o.filter(col("o_orderkey") % DeltaModulus === 0))
    val (cBase, cDelta) = (c.filter(col("c_custkey") % DimDeltaModulus =!= 0),
      c.filter(col("c_custkey") % DimDeltaModulus === 0))
    def j(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("cents"))
    j(oBase, cBase)            // V_old (materialized in production)
      .union(j(oDelta, cBase)) // ΔR ⋈ S_old
      .union(j(oBase, cDelta)) // R_old ⋈ ΔS
      .union(j(oDelta, cDelta)) // ΔR ⋈ ΔS
      .orderBy("o_orderkey")
  }
}
