import org.apache.spark.sql.SparkSession
object VidProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm
    graft.ops.MultimodalOps.videoTable(spark, dir).count()
    time("encode only (videoTable count)") {
      graft.ops.MultimodalOps.videoTable(spark, dir).count() }
    time("encode+walk+decode (mmVideo, no sort)") {
      graft.ops.MultimodalOps.mmVideo(spark, dir).limit(2000000).count() }
    spark.stop()
  }
}
