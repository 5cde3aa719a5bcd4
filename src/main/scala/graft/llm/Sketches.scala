package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{table => t}
import graft.functions.KMinValues
import TextHash._

/** Bounded-state sketch operators — the aggregations a 100 TB profile run
  * uses where the exact form would shuffle every distinct value.
  */
object Sketches {

  /** Sketch size: 64 hashes ≈ 12% standard error (1/√(k-2)) — a profiling
    * sketch, not a billing counter.
    */
  val KmvK = 64

  /** Hash-space size for [[TextHash.md5Long]] (first 8 md5 hex digits):
    * 2^32, as a double (exact).
    */
  val KmvHashSpace = 4294967296.0

  /** Engine-portable KMV input hash of a (NOT NULL) key — the ONE
    * definition the oracles mirror via `hexIntSql("'kmv:' || key")`.
    */
  def kmvHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5Long(concat(lit("kmv:"), key.cast("string")))

  /** The distinct-count estimate a KMV sketch array implies: exact below
    * capacity (the sketch IS the distinct hash set), `(k-1)·M/h_(k)` at
    * capacity — identical doubles in any engine (same integer divisions).
    * ONE definition for every consumer; a rounding or k change has a
    * single update site per engine.
    */
  def kmvEstimate(kmv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(kmv) < KmvK, size(kmv).cast("double"))
      .otherwise(round(lit((KmvK - 1).toDouble) * lit(KmvHashSpace) /
        element_at(kmv, KmvK).cast("double"), 4))

  /** Distinct order count per return flag, three ways on one pass:
    * the KMV sketch array (engine-portable, value-for-value), the estimate
    * it implies, and the exact distinct count it approximates. At 100 TB
    * the exact column is the one you delete: the KMV partial state is ≤ k
    * longs per (partition, group) through the shuffle, while exact
    * count(DISTINCT) reshuffles every distinct key. The estimate is pure
    * post-aggregation arithmetic: exact below k (the sketch holds the whole
    * distinct hash set), `(k-1)·M/h_(k)` at capacity — identical doubles in
    * any engine since both sides divide the same integers.
    */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val h = kmvHash(col("l_orderkey"))
    val li = t(s, dir, "lineitem")
    // the sketch and the exact count aggregate SEPARATELY: fused into one
    // agg, Spark's distinct-rewrite expands the grouping to
    // (flag, orderkey) and the KMV state gets built per distinct KEY —
    // thousands of buffers serialized through two extra phases (measured
    // ~2x on this query). Apart, the sketch keeps the clean two-phase
    // plan (one bounded buffer per partition per group), and the exact
    // side — the query you delete at 100 TB — joins back over the handful
    // of group rows.
    val sketch = li
      .select(col("l_returnflag"), h.as("h"))
      .groupBy(col("l_returnflag"))
      .agg(KMinValues(col("h"), KmvK).as("kmv"))
    val exact = li
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sketch.join(broadcast(exact), Seq("l_returnflag"))
      .select(
        col("l_returnflag"),
        size(col("kmv")).as("n_hashes"),
        element_at(col("kmv"), size(col("kmv"))).as("max_hash"),
        kmvEstimate(col("kmv")).as("est_distinct"),
        col("exact_distinct"))
      .orderBy("l_returnflag")
  }
}
