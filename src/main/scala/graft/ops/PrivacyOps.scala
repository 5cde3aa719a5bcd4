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
