package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{table => t}
import graft.llm.Sketches

/** One-pass table profiling — the operational first query against a table
  * you cannot afford to scan twice: per column, null count, min/max, and a
  * KMV distinct-count sketch, all inside a SINGLE aggregation over a
  * single scan. The per-column sketches are independent aggregate buffers
  * (not DISTINCT rewrites), so the plan has NO Expand — the multi-column
  * `count(DISTINCT a), count(DISTINCT b), …` form Spark expands into one
  * input replica per aggregate is exactly what this operator exists to
  * avoid. The exact distinct counts ride along from per-column follow-up
  * aggregations (the delete-at-100-TB half, same convention as
  * [[graft.llm.Sketches.kmvDistinct]]) so the oracle pins the estimates
  * against truth.
  */
object ProfileOps {

  /** Profiled frame: packages with their (half-present) owners — the LEFT
    * join gives `c_name`/`c_mktsegment` real nulls, so the null-count
    * column is exercised, not vacuously zero.
    */
  private def frame(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .join(broadcast(users), col("o_custkey") === col("c_custkey"), "left_outer")
  }

  /** Profiled columns: BIGINT and VARCHAR only — their `min/max → string`
    * casts are digit-exact in every engine (a double's string form is not).
    */
  val ProfileCols: Seq[String] =
    Seq("o_orderkey", "o_orderpriority", "c_name", "c_mktsegment")

  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val df = frame(s, dir)
    // one aggregation row: shared row count + 4 stats per column; the
    // KMV input hash is null for null keys, which the sketch skips —
    // distinct semantics line up with count(DISTINCT c) on both engines
    val perCol: Seq[Column] = ProfileCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        graft.functions.KMinValues(
          Sketches.kmvHash(col(c)), Sketches.KmvK).as(s"${c}__kmv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), perCol: _*)
    // unpivot the single row into one row per column; the sketch array
    // rides through the stack so the estimate derives AFTER unpivot from
    // the one shared kmvEstimate definition
    val stackArgs = ProfileCols.map(c =>
      s"'$c', ${c}__nulls, ${c}__kmv, ${c}__min, ${c}__max").mkString(", ")
    val unpivoted = one.selectExpr("n_rows",
      s"stack(${ProfileCols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, kmv, min_val, max_val)")
    // exact distinct per column: one tiny aggregation each, unioned and
    // broadcast — the verification half a 100 TB profile run drops
    val exact = ProfileCols.map { c =>
      df.agg(countDistinct(col(c)).as("exact_distinct"))
        .select(lit(c).as("column_name"), col("exact_distinct"))
    }.reduce(_ union _)
    unpivoted.join(broadcast(exact), Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        Sketches.kmvEstimate(col("kmv")).as("est_distinct"),
        col("exact_distinct"), col("min_val"), col("max_val"))
      .orderBy("column_name")
  }

  /** Data-quality constraint suite (the Deequ/dbt-test shape): one row per
    * declared constraint with how many rows it checked, how many violate,
    * and the pass verdict — the gate a 100 TB ingest runs before
    * publishing a partition. Five constraint families: completeness
    * (NOT NULL), domain (value set), range (non-negative), primary-key
    * uniqueness, and referential integrity.
    *
    * The fixture tables are clean, so the checked frame deterministically
    * re-dirties them first (modulo-keyed null/domain/duplicate injection —
    * the q_j11 device): every check must prove it can COUNT violations,
    * not just emit zeros.
    *
    * Shape: the three row-local checks share ONE conditional-aggregate
    * scan (no per-check re-scan) and unpivot via `inline` from its single
    * row; uniqueness is count-minus-distinct on the key; referential
    * integrity is one broadcast LEFT join with a conditional count — no
    * anti-join-plus-recount double pass. Each verdict row is O(1); the
    * whole suite costs two scans of the fact table and one of the dim.
    */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_orderkey") % 37 === 0, lit(null))
        .otherwise(col("o_custkey")).cast("long").as("fk"),
      when(col("o_orderkey") % 53 === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("status"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    // duplicate a keyed slice so the uniqueness check has real violations
    val dirty = base.union(base.filter(col("o_orderkey") % 101 === 0))

    val rowLocal = dirty
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("fk").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("status").isin("O", "F", "P"), 0L).otherwise(1L))
          .as("v_domain"),
        sum(when(col("cents") < 0, 1L).otherwise(0L)).as("v_range"))
      .select(inline(array(
        struct(lit("orders_fk_complete").as("check_name"),
          col("n_rows").as("n_checked"), col("v_null").as("n_violations")),
        struct(lit("orders_status_domain").as("check_name"),
          col("n_rows").as("n_checked"), col("v_domain").as("n_violations")),
        struct(lit("orders_cents_nonneg").as("check_name"),
          col("n_rows").as("n_checked"), col("v_range").as("n_violations")))))

    val unique = dirty
      .agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("nd"))
      .select(lit("orders_pk_unique").as("check_name"),
        col("n").as("n_checked"), (col("n") - col("nd")).as("n_violations"))

    // referenced dim: the half-present customer set (the repo's standing
    // c_custkey % 2 = 0 filter) so orphans actually exist
    val dim = t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"))
    val ref = dirty.filter(col("fk").isNotNull)
      .join(broadcast(dim), col("fk") === col("c_custkey"), "left_outer")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      .select(lit("orders_fk_customer").as("check_name"),
        col("n_checked"), col("n_violations"))

    rowLocal.union(unique).union(ref)
      .select(col("check_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy("check_name")
  }

  /** Drift histogram resolution and alert threshold: a bucket drifts when
    * its population share moved by more than `1/DriftDenom` (2 percentage
    * points) between the two halves.
    */
  val DriftBins = 10
  val DriftDenom = 50

  /** The shared drift verdict — ONE definition feeding the batch monitor,
    * the catalog view check, and the streaming fold: bucket share moved
    * by more than `1/DriftDenom`, cross-multiplied to BIGINT.
    */
  def driftVerdict(c1: Column, n1: Column, c2: Column, n2: Column): Column =
    abs(c1 * n2 - c2 * n1) * DriftDenom > n1 * n2

  /** The shared bucket arithmetic: fixed-width cents bin against the
    * broadcast upper bound (`//` floor semantics via integer `div`).
    */
  private[graft] def driftBin(cents: Column, mc: Column): Column =
    least(lit(DriftBins - 1L),
      call_function("div", cents * DriftBins, mc + 1)).cast("long")

  /** The 1-row binning-bounds artifact a deployment persists beside the
    * baseline histogram and broadcasts onto live streams — the stream
    * must bucket NEW data with the SAME bin edges the baseline used or
    * the comparison is meaningless.
    */
  def driftBounds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(max(round(col("value") * 100).cast("long")).as("mc"))

  /** Distribution-drift monitor — the [[dqChecks]] suite's longitudinal
    * sibling (the PSI/KS check of a model-monitoring stack): per event
    * type, the value distribution of the dataset's FIRST time half is
    * compared bucket-by-bucket against the second half, flagging any
    * bucket whose population share moved by more than 1/[[DriftDenom]].
    * The share comparison `|c₁/n₁ − c₂/n₂| > 1/D` is cross-multiplied to
    * `|c₁·n₂ − c₂·n₁| · D > n₁·n₂` — all BIGINT, no division, engine-
    * exact (PSI's log-ratio needs libm; the share-delta rule is the same
    * alert with the probabilities cleared to integers — the bm25/cooc
    * trade). Buckets are [[DriftBins]] fixed-width cents bins (the
    * histQuantiles monoid device); the time split is the midpoint of the
    * observed range. Both derive from ONE tiny global aggregate broadcast
    * back over the scan — a second, column-pruned pass over events (the
    * unavoidable bounds pre-pass of any fixed-bin scheme whose bounds
    * aren't known a priori; a deployment pins bounds in config and drops
    * it). The counting pass shuffles only the O(types·bins) rows.
    */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("event_type"),
      unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
    val g = e.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"),
      max(col("cents")).as("mc"))
    val half = when(col("ts_us") * 2 < col("lo") + col("hi"), 0L)
      .otherwise(1L)
    val bin = driftBin(col("cents"), col("mc"))
    val wp = Window.partitionBy(col("event_type"))
    e.crossJoin(broadcast(g))
      .select(col("event_type"), half.as("half"), bin.as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c2"))
      .withColumn("n1", sum(col("c1")).over(wp))
      .withColumn("n2", sum(col("c2")).over(wp))
      .select(col("event_type"), col("bin"), col("c1"), col("c2"),
        col("n1"), col("n2"),
        driftVerdict(col("c1"), col("n1"), col("c2"), col("n2"))
          .as("drifted"))
      .orderBy("event_type", "bin")
  }
}
