package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the PLANS.md physical-plan snapshots:
  * `sbt "runMain graft.PlanDump <sfDir> <query> [query ...]"` — prints each
  * query's executed plan in a markdown section.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
      println(s"[plandump] ## $n\n[plandump] ```")
      p.linesIterator.foreach(l => println(s"[plandump] $l"))
      println("[plandump] ```\n[plandump]")
    }
    spark.stop()
  }
}
