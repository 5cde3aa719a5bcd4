package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The complete harvest lifecycle (SURVEY.md §3) as one callable — the
  * set-oriented equivalent of running gather_stage + import_stage end to
  * end (`/root/reference/odgovlt.py:355-367,373-407`):
  *
  *   1. gather: published rows → JSON work items in staging (K1, S3 gate)
  *   2. import: staging → typed records (K2)
  *   3. assembly: joins + defaults + bridge collect + tag pipeline →
  *      package documents (J1-J4, P4, SF1-SF7)
  *   4. merge: classify create/update/delete against the target state
  *      (A7, K3-K5)
  *
  * The staging hop is the exactly-once boundary: a crashed import re-reads
  * the same staged snapshot, and re-running the whole job is idempotent
  * because the merge classifies against whatever the target holds.
  */
object SyncJob {

  final case class Result(packages: DataFrame, actions: DataFrame)

  def run(s: SparkSession, dir: String, stagingDir: String): Result = {
    SyncPipeline.gatherToStaging(s, dir, stagingDir)
    val staged = SyncPipeline.importFromStaging(s, dir, stagingDir).drop("guid")
    val packages = SyncPipeline.assembled(s, dir, Some(staged))
      .orderBy("o_orderkey")
    Result(packages, SyncPipeline.mergeActions(s, dir))
  }
}
