package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for q_dedup_components (deleted before round end). */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.llm.Dedup.nearDupComponents(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    graft.llm.TextAnalysis.preprocessCorpus(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      time(s"components $i") {
        graft.llm.Dedup.nearDupComponents(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      time(s"preprocess $i") {
        graft.llm.TextAnalysis.preprocessCorpus(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
