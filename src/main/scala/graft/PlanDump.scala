package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of declared queries, for PLANS.md
  * snapshots and plan review.
  *
  *   sbt "runMain graft.PlanDump q_pack_sequences [q_other ...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01 — PLANS.md's snapshot scale).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n## $n")
      println("```")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString.trim)
      println("```")
    }
    spark.stop()
  }
}
