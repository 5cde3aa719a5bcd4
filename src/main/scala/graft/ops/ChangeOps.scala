package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
import graft.Tables.{table => t}

/** Recursive change detection over nested documents — the reference's
  * `was_changed` (`/root/reference/odgovlt.py:112-124`), which walks the NEW
  * document's keys, recurses into nested dicts, walks the NEW list's
  * indices (an index past the old list's end is a change; a dropped old
  * tail is not), and ignores fields absent from the new side (subset
  * semantics: the sync never un-sets a field it isn't sending).
  *
  * Here the recursion happens at PLAN TIME over the new side's schema: the
  * builder emits one flat boolean expression tree (null-safe comparisons,
  * OR-reduced), so at runtime the diff is a single codegen'd predicate — no
  * per-row recursion, no UDF, row-local at scan speed on 100 TB.
  */
object ChangeOps {

  /** TRUE iff any field present in the NEW side's type differs from the
    * corresponding old field:
    *  - structs: recurse per field of `dt` (fields only on the old side are
    *    ignored — subset semantics);
    *  - arrays: walk the NEW list's indices (odgovlt.py:117-119 iterates
    *    `range(len(new))`): an index past the old list's end is a change,
    *    so a LONGER new list always fires; elements the old side has and
    *    the new side lacks are ignored (a shorter new list alone is not a
    *    change); shared indices recurse into element types;
    *  - a null-vs-null array/struct is unchanged, null-vs-value is a change;
    *  - leaves: null-safe inequality (`<=>` negated).
    *
    * `dt` is the NEW side's data type (from `df.schema(...)` — the Columns
    * themselves are unresolved at build time).
    */
  def subsetChanged(old: Column, neu: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      st.fields.map { f =>
        subsetChanged(old.getField(f.name), neu.getField(f.name), f.dataType)
      }.reduceOption(_ || _).getOrElse(lit(false))
    case ArrayType(et, _) =>
      when(old.isNull && neu.isNull, lit(false))
        .when(old.isNull || neu.isNull, lit(true))
        // new has indices old lacks → changed, before any element compare
        .when(size(neu) > size(old), lit(true))
        .otherwise(
          // here size(neu) <= size(old): new's full index range is the
          // compared prefix
          exists(
            zip_with(slice(old, lit(1), size(neu)), neu,
              (a, b) => subsetChanged(a, b, et)),
            x => x))
    case _ => not(old <=> neu)
  }

  /** Declared query (A7c): depth-2 recursive diff over assembled document
    * payloads. The new side is a SUBSET of the old (no `status`, no
    * `meta.priority`) with a shorter tag list — so the only changes that
    * fire are the genuine mutations: `meta.clerk` every 11th key and
    * `tags[0]` every 13th.
    */
  def a7cNestedDiff(s: SparkSession, dir: String): DataFrame = {
    val seg = col("o_custkey").cast("string")
    val oldDoc = struct(
      col("o_orderstatus").as("status"),
      struct(col("o_orderpriority").as("priority"), seg.as("seg")).as("meta"),
      array(col("o_orderpriority"), col("o_orderstatus"), lit("tail")).as("tags"))
    val newDoc = struct(
      struct(
        when(col("o_orderkey") % 11 === 0, lit("SEG-MUTATED"))
          .otherwise(seg).as("seg")).as("meta"),
      array(
        when(col("o_orderkey") % 13 === 0, lit("TAG-MUTATED"))
          .otherwise(col("o_orderpriority")),
        col("o_orderstatus")).as("tags"))
    val docs = t(s, dir, "orders")
      .select(col("o_orderkey"), oldDoc.as("old_doc"), newDoc.as("new_doc"))
    docs
      .filter(subsetChanged(col("old_doc"), col("new_doc"),
        docs.schema("new_doc").dataType))
      .select(col("o_orderkey"), col("new_doc.meta.seg").as("new_seg"))
      .orderBy("o_orderkey")
  }

  /** SCD type-2 dimension history from a change stream: per user, the
    * event stream (ordered by ts with the unique event_id as tie-break)
    * change-compresses — a row survives only where its attribute differs
    * from the previous row's — and each surviving version interval-izes
    * with `valid_from = its ts`, `valid_to = next version's ts` (null =
    * current). The two window passes (lag for compression, lead for
    * interval-izing) partition by the SAME key with the SAME order, so
    * Catalyst plans ONE exchange + one sort and runs both windows on it —
    * the filter between them preserves partitioning and order (PlanSpec
    * counts the exchanges). That is the scale property: building the
    * history of a 100 TB change stream costs one shuffle of the stream,
    * not one per window.
    *
    * Timestamps order and surface as shared-precision epoch MICROS (the
    * repo's j8/j9/funnel convention): raw-timestamp ordering is the j9
    * trap — an engine that keeps parquet nanos and one that truncates to
    * micros would silently disagree on sub-millisecond source data.
    */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_id").as("version_id"),
        col("event_type"), col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "valid_from_us", "version_id")
  }

  /** J10 (beyond reference): point-in-time dimension lookup against the
    * SCD2 history — each purchase fact joins the version that was OPEN at
    * its event time (`valid_from <= ts < valid_to`, open-ended for the
    * current version). The versions tile each user's timeline from their
    * first event, so every fact matches exactly one version; a
    * zero-length version (two boundary events on one timestamp) matches
    * nothing, by the same half-open rule both engines apply.
    *
    * Shape: equi-join on user_id with the interval as a residual
    * predicate (the j9 convention — never a range-only join), history
    * side O(users × versions); timestamps compare as shared-precision
    * epoch micros.
    */
  def j10ScdLookup(s: SparkSession, dir: String): DataFrame = {
    val hist = scd2History(s, dir)
      .select(col("user_id").as("h_user"), col("version_id"),
        col("event_type").as("version_type"),
        col("valid_from_us").as("from_us"),
        col("valid_to_us").as("to_us"))
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .join(hist, col("user_id") === col("h_user") &&
        col("from_us") <= col("ts_us") &&
        (col("to_us").isNull || col("ts_us") < col("to_us")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("version_id"), col("version_type"))
      .orderBy("event_id")
  }
}
