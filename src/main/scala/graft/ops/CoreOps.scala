package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operators from SURVEY.md §2.1-2.7, declared as
  * set-oriented DataFrame plans over the harness star schema
  * (role mapping in FIXTURES.md §3: orders≈t_rinkmena datasets,
  * customer≈t_user, nation/region≈t_istaiga + category levels,
  * lineitem≈bridge-grained facts).
  *
  * Design rules applied throughout:
  *  - dimension joins are broadcast (`broadcast()` hint) — no shuffle of the
  *    fact side, which is what survives a 100 TB fact table;
  *  - aggregates are hash aggregates with map-side partials (Catalyst
  *    default) — one shuffle each;
  *  - money sums go through integer cents (`BIGINT`) so results are exact
  *    and order-independent — double summation would be nondeterministic
  *    across partitionings and mismatch the DuckDB oracle;
  *  - every query ends in an explicit ORDER BY on a unique key
  *    (determinism contract, SURVEY.md §7.1).
  */
object CoreOps {
  import graft.Tables.{table => t}

  /** Exact money: double price → integer cents. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("bigint")

  // ---- scans / filters -------------------------------------------------

  /** S3/F1: filtered scan (`STATUSAS='U'` analog — only 'F' orders).
    * Predicate + projection push into the parquet scan. */
  def s3FilteredScan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  /** S4/S7/F2/W2: point lookup by primary key. */
  def s4PointLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") === 42L)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  /** S9/W1: latest row by timestamp (`ORDER BY created DESC LIMIT 1`). */
  def s9Latest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(1)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")

  /** S8/F3: projection + filter scan of the target-state table
    * (odgovlt.py:294-300 — group names where not an organization). */
  def s8Projection(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "error")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** F4/SF11: ownership filter through a kv-extras map
    * (odgovlt.py:313-316 — delete only groups whose extras say
    * `Šaltinis == 'IVPK IRS'`). The map is built row-local and probed with
    * element_at; the predicate still prunes at the scan after Catalyst
    * collapses the projection.
    */
  def f4OwnedFilter(s: SparkSession, dir: String): DataFrame = {
    val extras = map_from_entries(array(
      struct(lit("Šaltinis").as("key"),
        when(col("c_custkey") % 2 === 0, lit("IVPK IRS")).otherwise(lit("kitas"))
          .as("value")),
      struct(lit("Kodas").as("key"), col("c_custkey").cast("string").as("value"))))
    t(s, dir, "customer")
      .withColumn("extras", extras)
      .filter(element_at(col("extras"), "Šaltinis") === "IVPK IRS")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---- joins -------------------------------------------------------------

  /** J1/P5: fact ⟕ user-dim with default row on miss
    * (odgovlt.py:195-203 "Unknown User"). The dim is artificially halved so
    * the default path actually fires; broadcast left-outer + coalesce.
    */
  def j1LeftDefaults(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val dim = t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
    orders
      .join(broadcast(dim), col("o_custkey") === col("c_custkey"), "left_outer")
      .select(
        col("o_orderkey"),
        coalesce(col("c_name"), lit("Unknown User")).as("owner_name"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("owner_segment"))
      .orderBy("o_orderkey")
  }

  /** J2: dimension chain customer → nation → region (org lookup analog),
    * both hops broadcast. */
  def j2DimChain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"), "left_outer")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"), "left_outer")
      .select(
        col("c_custkey"),
        col("c_name"),
        coalesce(col("n_name"), lit("Unknown organization")).as("nation_name"),
        coalesce(col("r_name"), lit("Unknown region")).as("region_name"))
      .orderBy("c_custkey")

  /** J3/J4/A2/A6: bridge traversal — per order, the distinct sorted set of
    * part names reached through lineitem (dataset→bridge→category analog).
    * One shuffle (the groupBy); part-dim join is broadcast.
    */
  def j3BridgeGroups(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .join(broadcast(t(s, dir, "part").select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_name"))).as("gset"))
      // n_groups = |collect_set| — a second countDistinct agg would force
      // an Expand + extra aggregation pass for the same answer
      .select(
        col("l_orderkey"),
        array_join(col("gset"), "|").as("groups"),
        size(col("gset")).cast("long").as("n_groups"))
      .orderBy("l_orderkey")

  /** J6/SO3: left-semi (EXISTS) — customers having at least one order. */
  def j6Semi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J7/SO3: left-anti (NOT EXISTS) — the create-set: entities missing from
    * the target (odgovlt.py:249-255 show-then-create). Customers with no
    * urgent order (non-empty at every scale factor). */
  def j7Anti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // ---- aggregates ---------------------------------------------------------

  /** A1: distinct set build (CKAN group-name set analog). */
  def a1Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_mktsegment").as("segment"))
      .distinct()
      .orderBy("segment")

  /** A3/A4: group-by-parent → collected child list (category tree level). */
  def a3GroupCollect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), "|").as("members"),
        count(lit(1)).as("n_members"))
      .orderBy("n_regionkey")

  /** A8 + money-exact aggregation: counts and cent-exact sums per group. */
  def a8GroupStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("o_orderpriority")

  /** A9 (beyond reference): hierarchical rollup — per (status, priority),
    * per status, and grand total in one pass (Expand + single shuffle).
    */
  def a9Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_cents"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n_orders"), col("total_cents"))
      .orderBy("status", "priority")

  /** A7: deep change detection (was_changed, odgovlt.py:112-124) as a
    * set-oriented diff: `new` = source with a deterministic mutation on a
    * subset of keys; changed-set = keys whose *new-side* fields differ
    * (subset semantics: only fields present in `new` are compared).
    */
  def a7ChangeDetect(s: SparkSession, dir: String): DataFrame = {
    val old = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    val neu = old
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 10 === 0, lit("0-CHANGED"))
          .otherwise(col("o_orderpriority")))
      .withColumnRenamed("o_orderstatus", "n_status")
      .withColumnRenamed("o_orderpriority", "n_priority")
      .withColumnRenamed("o_orderkey", "n_orderkey")
    old.join(neu, col("o_orderkey") === col("n_orderkey"))
      .filter(col("o_orderstatus") =!= col("n_status") ||
        col("o_orderpriority") =!= col("n_priority"))
      .select(col("o_orderkey"), col("n_priority").as("new_priority"))
      .orderBy("o_orderkey")
  }

  /** A7b: the reference's list diff over a SHORTER new side
    * (odgovlt.py:117-119 — `was_changed` iterates `range(len(new))`, so
    * when the new list is no longer than the old one, only the common
    * prefix is compared and a dropped old tail alone is "unchanged"; a
    * LONGER new side would fire at `i >= len(old)`, the case
    * [[graft.ops.ChangeOps.subsetChanged]] covers generically).
    * Demonstrated over per-order collected part-name lists: the "new" side
    * drops the last element and mutates every 7th order's first element;
    * only the mutation fires the diff — the shorter list alone does not.
    */
  def a7bPrefixDiff(s: SparkSession, dir: String): DataFrame = {
    val groups = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .join(broadcast(t(s, dir, "part").select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_name"))).as("old_list"))
    // new_list is a row-local function of old_list, so the "new side" is a
    // withColumn on the SAME aggregation — a self-join here would run the
    // bridge aggregation twice and pay a sort-merge shuffle for an answer
    // every row already holds (round-1 bench: 9.8s as a self-join)
    groups
      .withColumn("new_list",
        when(col("l_orderkey") % 7 === 0,
          concat(array(lit("MUTATED")), slice(col("old_list"), lit(2), lit(10000))))
          .otherwise(slice(col("old_list"), lit(1), greatest(size(col("old_list")) - 1, lit(1)))))
      .withColumn("prefix_len",
        least(size(col("old_list")), size(col("new_list"))))
      .filter(exists(
        zip_with(
          slice(col("old_list"), lit(1), col("prefix_len")),
          slice(col("new_list"), lit(1), col("prefix_len")),
          (a, b) => a =!= b),
        x => x))
      .select(col("l_orderkey"), array_join(col("new_list"), "|").as("new_groups"))
      .orderBy("l_orderkey")
  }

  /** A10 (beyond reference): exact interpolated percentiles per group, over
    * integer cents so the interpolation inputs are identical in any engine;
    * rounded to 4 dp to absorb last-ulp interpolation differences.
    */
  def a10Quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(cents(col("o_totalprice")), lit(0.5)), 4).as("median_cents"),
        round(percentile(cents(col("o_totalprice")), lit(0.9)), 4).as("p90_cents"))
      .orderBy("o_orderpriority")

  val Priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** A11 (beyond reference): pivoted count matrix status × priority —
    * Catalyst rewrites the pivot to one aggregate pass with CASE partials.
    */
  def a11Pivot(s: SparkSession, dir: String): DataFrame = {
    val pivoted = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
    pivoted.select(
      (Seq(col("o_orderstatus")) ++
        Priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p))): _*)
      .orderBy("o_orderstatus")
  }

  /** A14 (beyond reference): UNPIVOT — the inverse reshape of [[a11Pivot]]
    * (melt wide per-priority count columns back to (status, priority, n)
    * rows) via `stack`, which Catalyst plans as one Generate over the
    * pivoted row: no shuffle beyond the pivot's own aggregate, no union of
    * N re-scans. Zero counts are kept (a pivot cell is a real 0, not an
    * absent row) so the roundtrip `unpivot(pivot(x)) = groupBy(x)+zeros`
    * is checkable, and the spec pins exactly that identity.
    */
  def a14Unpivot(s: SparkSession, dir: String): DataFrame =
    a11Pivot(s, dir)
      .select(col("o_orderstatus"), expr(
        s"stack(${Priorities.size}, " +
          Priorities.map(p => s"'$p', `$p`").mkString(", ") +
          ") AS (o_orderpriority, n_orders)"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** J12 (beyond reference): FULL OUTER reconciliation — the snapshot
    * diff report every sync pipeline ends with: per-customer order totals
    * of two halves of the fact table (the deterministic odd/even orderkey
    * split — the re-dirty/modulo device) joined full-outer, each customer
    * classified `both` / `left_only` / `right_only` with the integer-cents
    * delta. Completes the declared join surface (inner, left+defaults,
    * semi, anti, as-of, interval, and now full outer).
    *
    * Shape: two aggregates over one scan (conditional sums split the
    * halves — the table is NOT read twice) would be ideal, but halves must
    * reconcile as SETS (a customer may exist in one half only), so the
    * plan aggregates each half and full-outer-joins on the grouping key:
    * both sides are already reduced to O(customers) rows before the join
    * shuffle, which is the honest cost of a reconciliation at any scale.
    */
  def j12FullOuter(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    def half(m: Int) = orders.filter(col("o_orderkey") % 2 === m)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as(s"cents_$m"),
        count(lit(1)).as(s"n_$m"))
    half(0).join(half(1), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("cents_0"), lit(0L)).as("cents_a"),
        coalesce(col("n_0"), lit(0L)).as("n_a"),
        coalesce(col("cents_1"), lit(0L)).as("cents_b"),
        coalesce(col("n_1"), lit(0L)).as("n_b"),
        when(col("cents_0").isNull, "right_only")
          .when(col("cents_1").isNull, "left_only")
          .otherwise("both").as("presence"),
        (coalesce(col("cents_1"), lit(0L)) -
          coalesce(col("cents_0"), lit(0L))).as("delta_cents"))
      .orderBy("o_custkey")
  }

  // ---- set operations ------------------------------------------------------

  /** SO1: set difference (stale-group delete set, odgovlt.py:312):
    * customers owning a finished order but no urgent one. */
  def so1Except(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      .except(orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k")))
      .orderBy("k")
  }

  /** SO2: union + distinct (accumulated name set, odgovlt.py:301,307). */
  def so2Union(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("int").as("k"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("k")))
      .distinct()
      .orderBy("k")

  // ---- windows ---------------------------------------------------------------

  /** W1 (extended): top-k per group with deterministic tie-break. */
  def w1TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, dir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_acctbal"))
      .orderBy("c_nationkey", "rk")
  }

  /** W7: bounded ROW-frame moving aggregate — the remaining window frame
    * shape (running/unbounded frames: gap fill; time frames: tumbling/
    * sliding; rank frames: top-k). A 5-row trailing window per user
    * stream: count, integer-cent sum, and their ratio. The frame sums are
    * BIGINT (order-insensitive); the average is ONE division of two exact
    * integers, identical in any IEEE engine. One shuffle on the key; the
    * frame slides row-locally within each sorted partition.
    */
  def w7MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum_cents", sum(col("cents")).over(w))
      .withColumn("avg_cents",
        round(col("win_sum_cents") / col("win_n"), 4))
      .orderBy("event_id")
  }

  /** Trailing event-time horizon for [[w15RangeFrame]] (micros). */
  val RangeFrameMicros: Long = 3600000000L

  /** W15: a VALUE-RANGE window frame — `RANGE BETWEEN 1 hour PRECEDING
    * AND CURRENT ROW` over event-time micros, per event type: the
    * trailing-hour running count/sum every rate-limit or rolling-exposure
    * question needs. Deliberately distinct from the ROWS frames the suite
    * already covers (`q_w7_moving_avg` counts ROWS; a RANGE frame widens
    * and narrows with the actual timestamps, and all rows tied on the
    * ordering value share one frame — which also makes the result
    * independent of tie order, no unique-key crutch needed).
    *
    * Shape: one shuffle on the type key, one sorted pass; Spark and
    * DuckDB implement the sliding range frame with the same
    * two-pointer walk over the sorted partition. Sums in integer cents.
    */
  def w15RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
      .rangeBetween(-RangeFrameMicros, 0)
    graft.Tables.table(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h_cents", sum(col("cents")).over(w))
      .orderBy("event_id")
  }

  /** Calendar date spine spanning the fact table — the generated time
    * dimension every warehouse joins against (gap-free days between the
    * observed min/max order dates, with the flags a report needs). The
    * day-of-week comes from the epoch-day formula `(days + 4) % 7`
    * (0 = Sunday; 1970-01-01 was a Thursday) rather than each engine's
    * dayofweek builtin, whose numbering conventions differ — the
    * rfm-vs-ntile trust argument applied to dates. Month/quarter/year
    * extraction is proleptic-Gregorian in both engines.
    *
    * Scale shape: ONE single-row bounds aggregate over the pruned date
    * column, then a generated dimension (one `sequence` explode from a
    * 1-row frame) — the spine is O(days), independent of fact size.
    */
  def calSpine(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.{table => t}
    val bounds = t(s, dir, "orders")
      .agg(min(col("o_orderdate").cast("date")).as("d0"),
        max(col("o_orderdate").cast("date")).as("d1"))
    bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")).cast("int"))
      .withColumn("dow", ((col("epoch_day") + 4) % 7).cast("int"))
      .select(
        // ISO string, not DATE: the driver's pandas compare reads Spark
        // dates as objects and DuckDB dates as datetime64 (the SF8
        // zero-date convention applied to the spine key)
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("epoch_day"), col("dow"),
        (col("dow") === 0 || col("dow") === 6).as("is_weekend"),
        year(col("day")).cast("int").as("yr"),
        quarter(col("day")).cast("int").as("qtr"),
        month(col("day")).cast("int").as("mon"),
        (col("day") === last_day(col("day"))).as("is_month_end"))
      .orderBy("day")
  }

  /** Day-of-week seasonality — the [[calSpine]] dimension IN USE: orders
    * join the broadcast spine on the day key, collapse per dow, and the
    * per-day rate normalizes by how many of each weekday the spine
    * actually CONTAINS (the raw count alone would lie whenever the span
    * holds unequal weekday counts — the reason a calendar dimension
    * exists). Rate in integer thousandths (`n·1000 div days`).
    */
  def seasonality(s: SparkSession, dir: String,
      cache: Boolean = true): DataFrame = {
    import graft.Tables.{table => t}
    // cached: the spine feeds BOTH the per-dow day counts and the order
    // join — uncached, the bounds aggregate + sequence explode run twice;
    // cache = false for the view mount (standing contract)
    val spinePlan = calSpine(s, dir).select(col("day"), col("dow"))
    val spine = if (cache) spinePlan.cache() else spinePlan
    val days = spine.groupBy(col("dow")).agg(count(lit(1)).as("n_days"))
    val ords = t(s, dir, "orders")
      .select(date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd")
        .as("day"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      .join(broadcast(spine), "day")
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
    days.join(ords, "dow")
      .select(col("dow"), col("n_days"), col("n_orders"),
        expr("(n_orders * 1000) div n_days").as("orders_per_day_x1000"),
        col("total_cents"))
      .orderBy("dow")
  }
}
