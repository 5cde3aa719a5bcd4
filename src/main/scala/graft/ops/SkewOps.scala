package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 scale notes). AQE's skew-join
  * handling covers sort-merge joins at runtime; these cover the cases AQE
  * does not: hash aggregations over hot keys and broadcast-averse joins
  * where one key dominates.
  *
  * Both transformations preserve results exactly — they only change the
  * partitioning of intermediate state.
  */
object SkewOps {

  /** Salted equi-join: the probe side scatters each row to one of `salt`
    * sub-keys; the build side replicates every row to all `salt` sub-keys.
    * A single hot key then lands on `salt` reducers instead of one.
    * The salt is `rand(seed)`-derived — deterministic per seed, and the
    * join result is identical to the unsalted join regardless of salt.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, salt: Int, seed: Long = 42L): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      (F.rand(seed) * salt).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey) &&
          saltedProbe("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt), then
    * final aggregate on key — bounds any single reducer's input to
    * 1/salt of the hottest key. Catalyst's map-side partial aggregation
    * already gives this within a task; the explicit salt handles the
    * reducer-side hot spot that partials can't.
    */
  def saltedCount(df: DataFrame, key: String, salt: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Null-flood-safe left join: a nullable probe key sends every null row
    * to ONE reducer under hash partitioning — the third classic skew trap
    * beside hot keys (joins/aggs above). Null keys can never match, so
    * the fix is algebraic: route only `IS NOT NULL` rows through the
    * join's exchange and union the null rows back with null-extended
    * build columns — result identical to the plain left join, null flood
    * structurally impossible (the join input carries an isnotnull
    * filter; PlanSpec pins it).
    *
    * Precondition (checked loudly): probe and build column names must be
    * DISJOINT — a shared name would make the join condition ambiguous and
    * the null-extension overwrite a probe column (the same class of input
    * contract as [[saltedStats]]'s integral-sum requirement).
    */
  def nullSkewLeftJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String): DataFrame = {
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared.isEmpty,
      s"nullSkewLeftJoin requires disjoint schemas; shared: ${shared.mkString(", ")}")
    val joined = probe.filter(col(probeKey).isNotNull)
      .join(build, col(probeKey) === col(buildKey), "left_outer")
    val nullExtended = build.columns.foldLeft(
      probe.filter(col(probeKey).isNull)) { (df, c) =>
      df.withColumn(c, lit(null).cast(build.schema(c).dataType))
    }
    joined.unionByName(nullExtended)
  }

  /** [[saltedCount]] widened to count + sum — the declared-query form
    * (`q_skew_agg`). The summed column must be INTEGRAL (cents, counts):
    * integer re-aggregation is order-insensitive, so the salted result is
    * bit-identical to the unsalted one on any engine — a salted DOUBLE sum
    * would reorder additions and drift in the last ulp.
    */
  def saltedStats(df: DataFrame, key: String, valueCol: String, salt: Int,
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))

  /** EXACT skew-robust trailing range frame — the bucketed two-level
    * rewrite of [[graft.ops.CoreOps.w15RangeFrame]]'s
    * `RANGE BETWEEN W PRECEDING AND CURRENT ROW` per key. The plain form
    * sorts each KEY's whole history in one partition — with 5 event
    * types that is n/5 rows per sort partition at ANY scale, and a
    * GenSkew-hot key is the same trap (the q_w7 finding in
    * BENCH_skew.json). Here every sort partition is bounded by ONE TIME
    * BUCKET of one key, so a hot key spreads over its active time range
    * instead of one reducer.
    *
    * Decomposition (bucket width = the frame horizon W, so a frame spans
    * at most two buckets):
    *
    *  1. within-bucket part — a peers-inclusive running (count, sum)
    *     over `(key, bucket)` ordered by `us` (every same-bucket row is
    *     inside the frame: bucket start > us − W by construction);
    *  2. previous-bucket part — per event, the prev bucket's TOTAL minus
    *     its running prefix strictly below `us − W`, resolved by an
    *     AS-OF probe: probe rows (at `us − W`, sorted BEFORE data ties
    *     so the boundary row stays IN the frame — W PRECEDING is
    *     inclusive) pick up the last preceding data row's inclusive
    *     prefix via an ignore-nulls window over the union (the
    *     [[graft.ops.AsofOps]] device) — one match per event, never a
    *     per-event fanout join;
    *  3. bucket totals join back (O(keys·buckets) rows, broadcast) and
    *     the probe results rejoin on the unique event id.
    *
    * Equality with the single-window plan is the checked contract
    * (`q_skew_range_frame` shares `q_w15_range_frame`'s oracle
    * verbatim, the q_skew_agg convention); tie-independence holds
    * because the frame membership predicate `us' ∈ [us − W, us]` never
    * reads row order. Cost: three bounded shuffles + one equi-join vs
    * the plain form's one shuffle — the price of bounding every sort
    * partition; use it when a key's history outgrows a reducer.
    */
  def bucketedRangeFrame(events: DataFrame, key: String, W: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same fail-loud contract as bucketedRowsFrame: the decomposition
    // reads these by name regardless of `key`
    Seq("us", "event_id", "cents", key).foreach(c =>
      require(events.columns.contains(c),
        s"bucketedRangeFrame needs column $c (has ${events.columns.mkString(", ")})"))
    val base = events // (event_id, key, us, cents)
      .withColumn("__bucket", expr(s"us div ${W}L"))
    val wIn = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val within = base
      .withColumn("__in_n", count(lit(1)).over(wIn))
      .withColumn("__in_sum", sum(col("cents")).over(wIn))
    val totals = base.groupBy(col(key), col("__bucket"))
      .agg(count(lit(1)).as("__tot_n"), sum(col("cents")).as("__tot_sum"))
    // union frame: data rows carry their inclusive prefix; probe rows sit
    // at (us − W) in the PREVIOUS bucket, sorted before data ties
    val dataRows = within.select(col(key), col("__bucket").as("__b"),
      col("us"), lit(1).as("__tag"), lit(null).cast("long").as("__probe_id"),
      col("__in_n").as("__d_n"), col("__in_sum").as("__d_sum"))
    val probeRows = base.select(col(key), (col("__bucket") - 1).as("__b"),
      (col("us") - W).as("us"), lit(0).as("__tag"),
      col("event_id").as("__probe_id"),
      lit(null).cast("long").as("__d_n"), lit(null).cast("long").as("__d_sum"))
    val wPfx = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("us"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totalsKeyed = totals.select(col(key).as("__t_key"),
      col("__bucket").as("__t_b"), col("__tot_n"), col("__tot_sum"))
    val probed = dataRows.unionByName(probeRows)
      .withColumn("__seen_n", last(col("__d_n"), ignoreNulls = true).over(wPfx))
      .withColumn("__seen_sum", last(col("__d_sum"), ignoreNulls = true).over(wPfx))
      .filter(col("__probe_id").isNotNull)
      .join(totalsKeyed,
        col(key) === col("__t_key") && col("__b") === col("__t_b"),
        "left_outer")
      .select(col("__probe_id").as("event_id"),
        (coalesce(col("__tot_n"), lit(0L)) - coalesce(col("__seen_n"), lit(0L)))
          .as("__prev_n"),
        (coalesce(col("__tot_sum"), lit(0L)) - coalesce(col("__seen_sum"), lit(0L)))
          .as("__prev_sum"))
    within.join(probed, Seq("event_id"), "left_outer")
      .select(col("event_id"), col(key), col("us"), col("cents"),
        (col("__in_n") + coalesce(col("__prev_n"), lit(0L))).as("n_1h"),
        (col("__in_sum") + coalesce(col("__prev_sum"), lit(0L))).as("sum_1h_cents"))
  }

  /** EXACT skew-robust trailing ROWS frame — the bucketed two-level
    * rewrite of [[graft.ops.CoreOps.w7MovingAvg]]'s
    * `ROWS BETWEEN frame−1 PRECEDING AND CURRENT ROW` per key. The plain
    * form sorts each key's whole history in one partition — the round-11
    * sf1 skew tier measured it at 5.2× under the GenSkew half-hot user
    * (500 k rows in ONE sort task); here every sort partition is bounded
    * by one (key, time-bucket).
    *
    * A ROWS frame differs from the RANGE rewrite above in one hard way:
    * the trailing `frame−1` rows can reach back ARBITRARILY many buckets
    * (sparse keys), so "previous bucket total minus prefix" does not
    * apply. Instead the cross-bucket remainder is resolved through the
    * per-bucket TAIL stream:
    *
    *  1. within-bucket part — running (count, sum) over the trailing
    *     `frame−1` rows of `(key, bucket)` ordered by `(ts, event_id)`;
    *     rows with `row_number ≥ frame` are complete here and never
    *     touch the cross-bucket machinery;
    *  2. tail stream — each (key, bucket) keeps only its LAST
    *     `frame−1` rows (all of them if the bucket is shorter): the
    *     last `frame−1` rows globally preceding any bucket form a
    *     suffix of the concatenated earlier tails, so the stream loses
    *     nothing the frame can see. Per key it is ≤ (frame−1)·buckets
    *     rows — the ONLY per-key-sorted structure, (frame−1)/avg-bucket
    *     smaller than the key's history (tunable via W);
    *  3. prefix-sum lookups — tail rows get a per-key running index and
    *     cents prefix sum; a boundary row (row_number < frame) in
    *     bucket b needs the last `frame − row_number` tail rows below
    *     b: with `mb` = tail rows before b (max index − bucket count,
    *     indices are contiguous per key), the remainder is
    *     `csum(mb) − csum(mb − take)`, two equi-joins on the UNIQUE
    *     (key, index) pairs — never a fanout.
    *
    * Result identity with the single-window plan is the checked
    * contract (`q_skew_rows_frame` shares `q_w7_moving_avg`'s oracle
    * verbatim, the q_skew_range_frame convention); the decomposition
    * never reads row order beyond the (ts, event_id) total order the
    * plain window also uses, so ties resolve identically. Cost: the
    * extra tail shuffles and two joins vs one global sort — the price
    * of bounding every sort partition; use it when one key's history
    * outgrows a reducer.
    */
  def bucketedRowsFrame(events: DataFrame, key: String, frame: Int,
      W: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frame >= 1, s"frame=$frame: need at least the current row")
    // the OUTPUT names are reserved too: an input already carrying win_n
    // would silently produce duplicate output columns instead of failing
    val reserved = Seq("__bucket", "__rn", "__cnt", "__in_n", "__in_sum",
      "__tidx", "__tcsum", "__maxT", "__cntT", "__mb", "__need", "__take",
      "__hi_key", "__hi_tidx", "__csum_hi", "__lo_key", "__lo_tidx",
      "__csum_lo", "__prev_n", "__prev_sum", "win_n", "win_sum_cents")
    require(!events.columns.exists(reserved.contains),
      s"bucketedRowsFrame reserves ${reserved.mkString(", ")}")
    // the decomposition reads these columns by name regardless of `key`
    // — fail loud when the input frame doesn't carry them
    Seq("ts", "event_id", "cents", key).foreach(c =>
      require(events.columns.contains(c),
        s"bucketedRowsFrame needs column $c (has ${events.columns.mkString(", ")})"))
    val base = events.withColumn("__bucket",
      expr(s"unix_micros(ts) div ${W}L"))
    val wB = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col("ts"), col("event_id"))
    val wBframe = wB.rowsBetween(-(frame - 1), 0)
    val wBall = Window.partitionBy(col(key), col("__bucket"))
    val withIn = base
      .withColumn("__rn", row_number().over(wB))
      .withColumn("__in_n", count(lit(1)).over(wBframe))
      .withColumn("__in_sum", sum(col("cents")).over(wBframe))
      .withColumn("__cnt", count(lit(1)).over(wBall))
    // the tail stream: per (key, bucket) the last frame−1 rows
    val wT = Window.partitionBy(col(key))
      .orderBy(col("__bucket"), col("__rn"))
    val tails = withIn
      .filter(col("__rn") > col("__cnt") - (frame - 1))
      .select(col(key), col("__bucket"), col("__rn"), col("cents"))
      .withColumn("__tidx", row_number().over(wT))
      .withColumn("__tcsum",
        sum(col("cents")).over(wT.rowsBetween(Window.unboundedPreceding, 0)))
    // per (key, bucket): how many tail rows lie strictly BEFORE it
    // (indices are contiguous per key, so before = max-in-bucket − count)
    val perBucket = tails.groupBy(col(key), col("__bucket"))
      .agg(max(col("__tidx")).as("__maxT"), count(lit(1)).as("__cntT"))
      .withColumn("__mb", col("__maxT") - col("__cntT"))
      .select(col(key), col("__bucket"), col("__mb"))
    val hi = tails.select(col(key).as("__hi_key"),
      col("__tidx").as("__hi_tidx"), col("__tcsum").as("__csum_hi"))
    val lo = tails.select(col(key).as("__lo_key"),
      col("__tidx").as("__lo_tidx"), col("__tcsum").as("__csum_lo"))
    val boundary = withIn.filter(col("__rn") < frame)
      .select(col("event_id"), col(key), col("__bucket"), col("__rn"))
      .join(perBucket, Seq(key, "__bucket"))
      .withColumn("__take", least(lit(frame) - col("__rn"), col("__mb")))
      .join(hi, col(key) === col("__hi_key") &&
        col("__mb") === col("__hi_tidx"), "left_outer")
      .join(lo, col(key) === col("__lo_key") &&
        (col("__mb") - col("__take")) === col("__lo_tidx"), "left_outer")
      .select(col("event_id"), col("__take").as("__prev_n"),
        (coalesce(col("__csum_hi"), lit(0L)) -
          coalesce(col("__csum_lo"), lit(0L))).as("__prev_sum"))
    withIn.join(boundary, Seq("event_id"), "left_outer")
      .select((events.columns.map(col) ++ Seq(
        (col("__in_n") + coalesce(col("__prev_n"), lit(0L))).as("win_n"),
        (col("__in_sum") + coalesce(col("__prev_sum"), lit(0L)))
          .as("win_sum_cents"))): _*)
  }

  /** EXACT skew-robust sessionization — the bucketed two-level rewrite of
    * [[graft.streaming.StreamOps.sessionizeBatch]]'s per-key gap
    * detection, answering the LAST per-key-sort shape the sf1 skew tier
    * left standing (`q_w3_sessionize` 1.6× under the half-hot user; its
    * only prior deployment answer was the streaming twin). Gap detection
    * looks like it needs the key's whole history in one sorted partition
    * — it doesn't: a session boundary depends on ONE predecessor, and
    * session NUMBERING is a prefix count of boundaries, both of which
    * decompose over (key, time-bucket):
    *
    *  1. within-bucket — `lag(ts)` and the running boundary count over
    *     `(key, bucket)` ordered by `(ts, event_id)`; every sort
    *     partition is bounded by one bucket's width W, never by a key's
    *     history (the bucket is ts-monotone, so bucket order then
    *     within-bucket order IS the global (ts, event_id) order and ties
    *     resolve identically to the plain window);
    *  2. boundary carry — a bucket's FIRST event's predecessor is the
    *     last event of the key's previous non-empty bucket: one
    *     `lag(max(ts))` over the per-bucket stream (ONE row per
    *     non-empty bucket — for the half-hot user with 500 k events in
    *     a fixed span this stream is span/W rows, data-size-independent);
    *  3. numbering — session_id = within-bucket running boundary count
    *     + the per-key prefix sum of earlier buckets' boundary totals
    *     (again one row per bucket), joined back on (key, bucket).
    *
    * First event of a key: no predecessor anywhere, the gap predicate is
    * null, the flag 0 — exactly the plain form's `lag` null path. Result
    * identity with the single-window plan is the checked contract
    * (`q_skew_sessionize` shares `q_w3_sessionize`'s oracle verbatim,
    * the q_skew_range_frame convention). Cost: two extra (key, bucket)
    * shuffles and the tiny bucket-stream windows vs one global per-key
    * sort — use it when one key's history outgrows a reducer.
    */
  def bucketedSessionize(events: DataFrame, key: String, gapSeconds: Long,
      W: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapSeconds >= 1, s"gapSeconds=$gapSeconds: need a positive gap")
    val reserved = Seq("__bucket", "__rn", "__prev_in", "__last_ts",
      "__prev_last", "__prev", "__flag", "__sid_in", "__bflags", "__bprefix",
      "session_id", "n_events", "session_start", "session_end")
    require(!events.columns.exists(reserved.contains),
      s"bucketedSessionize reserves ${reserved.mkString(", ")}")
    Seq("ts", "event_id", key).foreach(c =>
      require(events.columns.contains(c),
        s"bucketedSessionize needs column $c (has ${events.columns.mkString(", ")})"))
    val base = events.withColumn("__bucket",
      expr(s"unix_micros(ts) div ${W}L"))
    val wB = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col("ts"), col("event_id"))
    // one row per (key, non-empty bucket): the bucket's last event ts
    // (max = last in (ts, event_id) order — ts is the leading sort key),
    // lagged one bucket to give every bucket-first row its predecessor
    val wK = Window.partitionBy(col(key)).orderBy(col("__bucket"))
    val carries = base.groupBy(col(key), col("__bucket"))
      .agg(max(col("ts")).as("__last_ts"))
      .withColumn("__prev_last", lag(col("__last_ts"), 1).over(wK))
      .select(col(key), col("__bucket"), col("__prev_last"))
    val flagged = base
      .withColumn("__rn", row_number().over(wB))
      .withColumn("__prev_in", lag(col("ts"), 1).over(wB))
      .join(carries, Seq(key, "__bucket"))
      .withColumn("__prev",
        when(col("__rn") === 1, col("__prev_last")).otherwise(col("__prev_in")))
      .withColumn("__flag",
        when(col("ts").cast("long") - col("__prev").cast("long") > gapSeconds,
          1L).otherwise(lit(0L)))
    val prefixes = flagged.groupBy(col(key), col("__bucket"))
      .agg(sum(col("__flag")).as("__bflags"))
      .withColumn("__bprefix",
        coalesce(sum(col("__bflags"))
          .over(wK.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(key), col("__bucket"), col("__bprefix"))
    flagged
      .withColumn("__sid_in",
        sum(col("__flag")).over(wB.rowsBetween(Window.unboundedPreceding, 0)))
      .join(prefixes, Seq(key, "__bucket"))
      .withColumn("session_id", col("__sid_in") + col("__bprefix"))
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(key, "session_id")
  }

  /** Hash salt prefixing every bloom-join key (mirrored in the oracle-free
    * spec; the result is key-transparent so no oracle sees it).
    */
  private val BloomJoinSalt = "bj:"

  private def bloomKey(key: org.apache.spark.sql.Column) =
    graft.llm.TextHash.md5Long(concat(lit(BloomJoinSalt), key.cast("string")))

  /** Runtime-filter join: when the build side is too big to broadcast but
    * its BLOOM isn't (16 KB vs GBs — the regime every star-schema join at
    * 100 TB lives in once the dim outgrows `autoBroadcastJoinThreshold`),
    * ship the bloom of the build keys to the probe scan and drop
    * non-matching fact rows BEFORE the shuffle: the exchange then carries
    * only (matches + bloom false positives) instead of the whole fact
    * table. The exact equi-join afterwards removes the false positives,
    * so the result is IDENTICAL to the plain join — the bloom only
    * changes what the shuffle carries (the saltedJoin contract). This is
    * the manual form of the runtime-filter/DPP family Spark applies to
    * partition columns; here it works on arbitrary keys.
    *
    * The probe predicate is the codegen'd [[graft.functions.BloomContains]]
    * — scan-speed, the decontamination economics applied to a join.
    */
  def bloomJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, bits: Int = 1 << 17, hashes: Int = 5): DataFrame = {
    import graft.functions.{BloomBuild, BloomContains}
    // same guard discipline as asofJoin: shared column names would make
    // col(probeKey) === col(buildKey) ambiguous or duplicate outputs, and
    // the internal bloom column must not shadow a user column
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared.isEmpty,
      s"bloomJoin requires disjoint schemas; shared: ${shared.mkString(", ")}" +
        " — rename one side's columns first")
    require(!probe.columns.contains("__bits") && !probe.columns.contains("__h")
      && !build.columns.contains("__bits") && !build.columns.contains("__h"),
      "bloomJoin reserves the __bits/__h column names")
    val bloom = build
      .select(bloomKey(col(buildKey)).as("__h"))
      .agg(BloomBuild(col("__h"), bits, hashes).as("__bits"))
    probe
      .crossJoin(broadcast(bloom))
      .filter(BloomContains(col("__bits"), bloomKey(col(probeKey))))
      .drop("__bits")
      .join(build, col(probeKey) === col(buildKey))
  }
}
