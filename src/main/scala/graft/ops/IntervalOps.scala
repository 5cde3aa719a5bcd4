package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{table => t}

/** Event-time interval (range) join — the adjunct to [[AsofOps]]: every
  * right row within a bounded window AFTER the left row, not just the
  * latest-before match. The view→click attribution shape of a training-data
  * event pipeline.
  *
  * Scale design: an equi-join on the entity key with the time range as a
  * residual predicate, so it hash-partitions by key like any other join —
  * never a cross or range-only join; the window bound keeps per-key match
  * counts O(activity in the window). Time comparisons happen in epoch
  * MICROSECONDS — the precision Spark holds after truncating the
  * nanosecond parquet source — computed identically by any engine reading
  * the same file, so boundary semantics are exact, not
  * truncation-dependent.
  */
object IntervalOps {

  /** Generic core: views (view_id, user_id, v_us) ⋈ clicks (click_id,
    * c_user, c_us) on the user key, click strictly after the view and
    * within `windowMicros` of it (inclusive upper bound), with the
    * floor-second delay. Property-pinned against a naive all-pairs
    * reference on boundary-dense inputs (IntervalProps).
    */
  def intervalJoinMicros(views: DataFrame, clicks: DataFrame,
      windowMicros: Long): DataFrame =
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") > col("v_us") &&
          col("c_us") <= col("v_us") + lit(windowMicros))
      .select(col("view_id"), col("click_id"), col("user_id"),
        floor((col("c_us") - col("v_us")) / lit(1000000L)).as("delay_s"))

  /** Every click by the same user strictly after a view and within
    * `windowSeconds` of it, with the floor-second delay.
    */
  def viewClickAttribution(s: SparkSession, dir: String,
      windowSeconds: Long = 600L): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("v_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    intervalJoinMicros(views, clicks, windowSeconds * 1000000L)
      .orderBy("view_id", "click_id")
  }

  /** FIRST-TOUCH attribution — the credit-assignment policy on top of
    * [[viewClickAttribution]]'s candidate pairs: each click credits the
    * EARLIEST view inside its window (marketing's "what started the
    * journey", vs the pair table's every-candidate reading; last-touch is
    * the same argmin with the order flipped). The argmin runs as one
    * `min_by` aggregate over the pair table under the unique
    * (v_us, view_id) order — an aggregate, not a window: no per-click
    * sort, map-side-combinable, the arg-min-by-struct device.
    */
  /** The declared `q_j9b_first_touch` consideration window: a DAY — at the
    * fixture's event density the 10-minute j9 window never yields a
    * multi-candidate click, which would make the first-touch argmin
    * vacuous (139 multi-candidate clicks at sf0.01 with a day). One
    * constant feeds the registry lambda, the GraftCatalog view mount, and
    * the SQL oracle (as micros) so an edit cannot desync the three sites.
    */
  val FirstTouchWindowSeconds = 86400L

  def firstTouchAttribution(s: SparkSession, dir: String,
      windowSeconds: Long = 600L): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("v_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    val pairs = views.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") > col("v_us") &&
          col("c_us") <= col("v_us") + lit(windowSeconds * 1000000L))
      .select(col("click_id"), col("user_id"), col("c_us"),
        col("view_id"), col("v_us"))
    pairs
      .groupBy(col("click_id"))
      .agg(
        // constant per click group; max (order-insensitive) rather than
        // first (ordering-dependent in general) keeps the aggregate
        // deterministic by construction, not by accident
        max(col("user_id")).as("user_id"),
        max(col("c_us")).as("c_us"),
        min_by(col("view_id"),
          struct(col("v_us").as("u"), col("view_id").as("v")))
          .as("first_view_id"),
        min(col("v_us")).as("first_v_us"),
        count(lit(1)).as("n_candidates"))
      .select(col("click_id"), col("user_id"), col("first_view_id"),
        (col("c_us") - col("first_v_us")).as("delay_us"),
        col("n_candidates"))
      .orderBy("click_id")
  }
}
