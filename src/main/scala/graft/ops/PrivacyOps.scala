package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{table => t}

/** Privacy-assessment operators — the release-gating complement of the
  * redaction pass ([[graft.llm.Curation.piiRedact]] removes direct
  * identifiers; this tier measures what the QUASI-identifiers still leak
  * before a dataset ships). The reference has no privacy surface; this is
  * the north-star curation tier's governance edge.
  */
object PrivacyOps {

  /** k-anonymity floor: an equivalence class smaller than this re-identifies. */
  val KAnonK = 5

  /** Sensitive-attribute bucket width for the l-diversity count (account
    * balance in whole thousands of cents — coarse enough that diversity
    * measures the attribute, not float noise).
    */
  val SensitiveBucket = 100000L

  /** Deterministic erasure-request synthesis for [[erasurePropagation]]
    * (the fixture carries no request table — the j11/rowWeight synthesis
    * convention, mirrored in the oracle): every customer whose key is
    * divisible by this modulus has asked to be forgotten.
    */
  val ErasureModulus = 11

  /** Right-to-erasure propagation — the "delete me" request cascaded
    * through the star schema: the requesting customer keys drive a
    * broadcast semi/anti split of every referencing table (orders by
    * custkey, events by user_id, lineitems transitively through the
    * erased orders), and the report is one row per (table, action) with
    * the affected row count — the audit artifact a deletion job files
    * BEFORE it mutates anything. The transitive lineitem cascade is the
    * point: a fact can reference the subject only through another fact,
    * and the propagation must follow the FK chain, not just direct
    * references.
    *
    * Scale shape: the request set broadcasts (erasure batches are tiny
    * against 100 TB facts); every per-table split is one broadcast
    * semi/anti join pair over that table's scan; counts collapse
    * map-side. Nothing shuffles but the final O(tables) report union.
    */
  def erasurePropagation(s: SparkSession, dir: String): DataFrame = {
    val subjects = broadcast(
      t(s, dir, "customer")
        .filter(col("c_custkey") % ErasureModulus === 0)
        .select(col("c_custkey").as("k")))
    def split(df: DataFrame, key: String, table: String): DataFrame = {
      val del = df.join(subjects, col(key) === col("k"), "left_semi")
        .agg(count(lit(1)).as("n"))
        .select(lit(table).as("tbl"), lit("erase").as("action"), col("n"))
      val keep = df.join(subjects, col(key) === col("k"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit(table).as("tbl"), lit("retain").as("action"), col("n"))
      del.union(keep)
    }
    val erasedOrders = broadcast(
      t(s, dir, "orders")
        .join(subjects, col("o_custkey") === col("k"), "left_semi")
        .select(col("o_orderkey").as("k")))
    val liSplit = {
      val li = t(s, dir, "lineitem")
      val del = li.join(erasedOrders, col("l_orderkey") === col("k"), "left_semi")
        .agg(count(lit(1)).as("n"))
        .select(lit("lineitem").as("tbl"), lit("erase").as("action"), col("n"))
      val keep = li.join(erasedOrders, col("l_orderkey") === col("k"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("lineitem").as("tbl"), lit("retain").as("action"), col("n"))
      del.union(keep)
    }
    split(t(s, dir, "customer"), "c_custkey", "customer")
      .union(split(t(s, dir, "orders"), "o_custkey", "orders"))
      .union(split(t(s, dir, "events"), "user_id", "events"))
      .union(liSplit)
      .orderBy("tbl", "action")
  }

  /** k-anonymity / l-diversity assessment over the customer table with
    * quasi-identifiers (mktsegment, nationkey) and sensitive attribute
    * acctbal (bucketed): one row per equivalence class with its size,
    * the distinct-sensitive-value count (l), and the two verdicts —
    * `at_risk` (class size < k: the class re-identifies) and
    * `homogeneous` (l = 1: even a k-anonymous class leaks the sensitive
    * value by membership alone, the classic l-diversity motivation).
    *
    * Scale shape: ONE groupBy on the quasi-identifier tuple (map-side
    * partial count + partial distinct via the two-level aggregate Spark
    * plans for count_distinct); output is O(classes). The generalization
    * loop a release pipeline runs (coarsen QI until every class passes)
    * is this same query re-evaluated per lattice level.
    */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").as("nationkey"),
        // +1e8 cents shifts every balance positive BEFORE the integer
        // div: negative acctbal under Spark `div` (truncates) vs DuckDB
        // `//` (floors) would bucket differently — the cohort-retention
        // floor-division lesson
        expr(s"(cast(round(c_acctbal * 100) as bigint) + 100000000) div $SensitiveBucket")
          .as("sens_bucket"))
      .groupBy(col("segment"), col("nationkey"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sens_bucket")).as("l_diversity"))
      .select(col("segment"), col("nationkey"), col("class_size"),
        col("l_diversity"),
        (col("class_size") < KAnonK).as("at_risk"),
        (col("l_diversity") === 1).as("homogeneous"))
      .orderBy("segment", "nationkey")
}
