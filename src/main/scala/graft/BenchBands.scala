package graft

import org.apache.spark.sql.SparkSession

/** Width bench for the parameterized SimHash band tier: times the 64-bit
  * pair chain at each block-count setting (and the 32-bit degenerate
  * baseline) over one or more data directories, and records the analytic
  * verify workload Σ_bucket C(c,2) alongside — the quantity the
  * n²/2^keyBits saturation arithmetic bounds, so the table shows both
  * the measured second and the comparison count it is made of.
  *
  * Usage: runMain graft.BenchBands <dir> [<dir> ...]
  * Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 3),
  *        SPARK_GRAFT_BAND_BLOCKS (csv, default "4,5,6")
  * Prints ONE JSON line:
  *   {"metric":"simhash_band_width","dirs":{dir:{setting:{"median":s,
  *    "min":s,"runs":[...],"pairs":N,"comparisons":N}}}}
  */
object BenchBands {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchBands <dir> [<dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val blockSettings = sys.env.getOrElse("SPARK_GRAFT_BAND_BLOCKS", "4,5,6")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }

    val perDir = args.toSeq.map { dir =>
      val settings = scala.collection.mutable.LinkedHashMap[String, String]()
      def record(name: String, pairsOf: => org.apache.spark.sql.DataFrame,
                 comparisons: => Long): Unit = {
        val runs = (1 to nRuns).map { _ =>
          time(pairsOf.write.format("noop").mode("overwrite").save())
        }
        val nPairs = pairsOf.count()
        spark.catalog.clearCache()
        val cmp = comparisons
        spark.catalog.clearCache()
        settings(name) =
          s"""{"median":${median(runs)},"min":${runs.min},""" +
            s""""runs":[${runs.mkString(",")}],"pairs":$nPairs,""" +
            s""""comparisons":$cmp}"""
        System.err.println(f"[bands] $dir $name median=${median(runs)}%.2fs " +
          f"pairs=$nPairs comparisons=$cmp")
      }
      blockSettings.foreach { b =>
        record(s"w64_b$b",
          graft.llm.Dedup.simhash64PairsUnsortedAt(spark, dir, b),
          graft.llm.Dedup.simhash64BandComparisons(spark, dir, b))
      }
      // the saturated 32-bit baseline column — skippable for tiers where
      // its n²/2^w wall is already measured and would dominate the run
      // (SPARK_GRAFT_BAND_W32=0)
      if (sys.env.getOrElse("SPARK_GRAFT_BAND_W32", "1") != "0")
        record("w32_b7",
          graft.llm.Dedup.simhashPairsUnsorted(spark, dir),
          graft.llm.Dedup.simhash32BandComparisons(spark, dir))
      val body = settings.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s""""$dir":{$body}"""
    }
    println(s"""{"metric":"simhash_band_width","runs_per_setting":$nRuns,""" +
      s""""dirs":{${perDir.mkString(",")}}}""")
    spark.stop()
  }
}
