package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{table => t}

/** As-of (point-in-time) join — an operator Spark's built-ins lack,
  * composed from union + an ignore-nulls running `last` window instead of a
  * custom physical operator (SURVEY.md preference order: compose existing
  * ops before custom plans).
  *
  * Shape: tag both inputs, union, sort each key's timeline once
  * (right rows before left rows at equal timestamps → inclusive match),
  * carry the right payload forward with `last(_, ignoreNulls)` over
  * UNBOUNDED PRECEDING..CURRENT ROW, keep the left rows.
  *
  * Scale: one shuffle on the key (the window partition), then a single
  * sorted pass per key — same cost as any windowed computation, no
  * per-left-row probe or range join blowup; exactly how a 100 TB
  * events-to-dimension point-in-time enrichment should run.
  */
object AsofOps {

  /** For each `left` row: the payload of the latest `right` row of the same
    * `key` with `right.ts <= left.ts` (nulls when none precede).
    *
    * The payload travels as ONE struct that is non-null for every right row
    * (a struct of nullable fields is itself non-null), so
    * `last(ignoreNulls)` skips exactly the left-row padding — a right row
    * whose payload columns are genuinely NULL still wins the match and
    * yields those NULLs, instead of leaking an older non-null value.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    // the payload columns become output columns next to left's — a name
    // collision would make the final projection ambiguous or silently wrong
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"asofJoin: payload column(s) ${clash.mkString(", ")} collide with left columns " +
        s"— rename them on the right side first")
    // internal tag/payload columns must not collide with user columns either
    val taken = (left.columns ++ payload).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val sideCol = fresh("__side")
    val payloadCol = fresh("__payload")
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType)))
    val l = left.select(
      left.columns.map(col) ++ Seq(
        lit(1).as(sideCol),
        lit(null).cast(payloadType).as(payloadCol)): _*)
    // SQL join semantics: a NULL key or NULL ts on the right can never
    // match anything (NULL comparisons are not true) — filter them out so
    // a NULL-ts row doesn't sort nulls-first and "match" every left row
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
        Seq(col(key), col(ts), lit(0).as(sideCol),
          struct(payload.map(col): _*).as(payloadCol)) ++
          left.columns.filterNot(c => c == key || c == ts)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(sideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn(payloadCol, last(col(payloadCol), ignoreNulls = true).over(w))
    carried.filter(col(sideCol) === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(payloadCol).getField(p).as(p)): _*)
  }

  /** Declared query: for every error event, the latest preceding (or
    * simultaneous) click of the same user. Clicks deduped to one per
    * (user, ts) so the match is unique; misses map to sentinel values to
    * keep the oracle compare type-stable.
    */
  def asofClick(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    asofJoin(errors, clicks, "user_id", "ts", Seq("click_event_id", "click_ts"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
        coalesce(col("click_ts"), lit("1970-01-01 00:00:00").cast("timestamp"))
          .as("click_ts"))
      .orderBy("event_id")
  }

  /** Match tolerance for [[asofClickTol]] (micros): a click older than
    * this is stale context, not attribution.
    */
  val AsofTolMicros: Long = 3600000000L

  /** The tolerance variant of [[asofClick]] (pandas `merge_asof`'s
    * `tolerance=`): the latest preceding click still matches ONLY when it
    * happened within [[AsofTolMicros]] of the error — beyond that the row
    * degrades to the no-match defaults. Same composed one-window plan;
    * the tolerance is a row-local verdict on the carried payload
    * (comparison in shared-precision epoch micros, the j8/j9 convention),
    * so the variant costs nothing over the plain as-of.
    */
  def asofClickTol(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val inTol = col("click_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("click_ts")) <= AsofTolMicros
    asofJoin(errors, clicks, "user_id", "ts", Seq("click_event_id", "click_ts"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        coalesce(when(inTol, col("click_event_id")), lit(-1L))
          .as("click_event_id"),
        coalesce(when(inTol, col("click_ts")),
          lit("1970-01-01 00:00:00").cast("timestamp")).as("click_ts"),
        inTol.as("matched"))
      .orderBy("event_id")
  }

  /** Forward fill (last observation carried forward) — the within-stream
    * sibling of the as-of join: a sparse reading column fills from the
    * most recent non-null value of the SAME key's stream, via
    * `last(_, ignoreNulls).over(rowsBetween(unboundedPreceding, current))`
    * — one window, one shuffle on the key, row-local carry within each
    * sorted partition (Spark's IGNORE NULLS last is O(1) per row in a
    * running frame, and DuckDB's `last_value(x IGNORE NULLS)` is the same
    * operator, so the fill is engine-exact).
    *
    * The fixture's `value` is dense, so sparsity is synthesized
    * deterministically (a reading survives only on every third event_id —
    * the piiRedact precedent for features the fixture lacks); readings
    * travel as integer cents, the portable money representation.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 3 === 0,
          round(col("value") * 100).cast("long")).as("reading_cents"))
      .withColumn("filled_cents",
        last(col("reading_cents"), ignoreNulls = true).over(w))
      .orderBy("event_id")
  }

  /** Linear interpolation between observations — [[gapFill]]'s carry
    * upgraded to time-weighted reconstruction: a missing reading takes
    * `prev + (next − prev)·(t − t_prev)/(t_next − t_prev)`, the value the
    * straight line between the surrounding observations passes through at
    * this row's timestamp. Series edges degrade gracefully: before the
    * first observation the fill is the next one (backfill), after the
    * last it is the carry, and a key with no observations stays null.
    *
    * Determinism: the division is integer FLOOR division written as
    * `(a − ((a%b + b)%b)) / b` — `%` is C-style (sign follows the
    * dividend) in both engines, so the expression is engine-identical
    * for the negative numerators a falling line produces, with no
    * floating point anywhere. The weight numerator
    * `(next−prev)·(t−t_prev)` stays in BIGINT — exact while
    * |Δcents|·Δmicros < 2^63 (a 10^5-cent swing over a month-long gap is
    * ~2.6·10^17; wider regimes lift the product to DECIMAL(38,0)
    * unchanged, the lengthOutliers convention).
    *
    * Shape: ONE shuffle on the key — the backward-looking carry pair and
    * the forward-looking fill pair are two frames over the SAME window
    * sort, so Spark evaluates all four in one Window pass; the
    * interpolation itself is a row-local projection. Sparsity is
    * synthesized as in [[gapFill]] (a reading survives on every third
    * event_id).
    */
  def interpFill(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("reading_cents").isNotNull, col("ts_us"))
    // floor division, engine-identical for negative numerators; the final
    // division runs in INTEGER arithmetic (`div` here, `//` in the
    // oracle) on the already-exactly-divisible numerator — a double `/`
    // would round the >2^53 numerator before dividing
    def floorDiv(a: Column, b: Column): Column =
      call_function("div", a - ((a % b + b) % b), b)
    val num = (col("next_cents") - col("prev_cents")) *
      (col("ts_us") - col("prev_ts"))
    val den = col("next_ts") - col("prev_ts")
    graft.Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_id") % 3 === 0,
          round(col("value") * 100).cast("long")).as("reading_cents"))
      .withColumn("prev_cents",
        last(col("reading_cents"), ignoreNulls = true).over(back))
      .withColumn("prev_ts", last(obsTs, ignoreNulls = true).over(back))
      .withColumn("next_cents",
        first(col("reading_cents"), ignoreNulls = true).over(fwd))
      .withColumn("next_ts", first(obsTs, ignoreNulls = true).over(fwd))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("reading_cents"),
        when(col("reading_cents").isNotNull, col("reading_cents"))
          .when(col("prev_cents").isNull, col("next_cents"))
          .when(col("next_cents").isNull, col("prev_cents"))
          // equal surrounding timestamps (a micros tie) make the line
          // degenerate AND the division a ÷0 — carry, before dividing
          .when(col("next_ts") === col("prev_ts"), col("prev_cents"))
          .otherwise(col("prev_cents") + floorDiv(num, den).cast("long"))
          .as("interp_cents"),
        col("reading_cents").isNull.as("was_filled"))
      .orderBy("event_id")
  }
}
