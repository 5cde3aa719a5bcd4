package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the bench's build/probe split ([[BenchSplits]]): for every
  * declared index-family query, serving the PROBE half off artifacts that
  * were frozen to parquet and read back (exactly what [[Bench]]'s split
  * phase does) must reproduce the declared query's output row-for-row —
  * otherwise the separately-reported probe line would be timing a
  * different computation than the one the correctness gate checks.
  */
class BenchSplitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("every probe over frozen parquet artifacts equals its declared query") {
    val dir = java.nio.file.Files.createTempDirectory("split_spec").toString
    // the declared q_bpe_encode result must come from the SAME training
    // run the build group freezes — force a cold store so the comparison
    // cannot silently ride a memo from an earlier suite
    graft.llm.TextAnalysis.invalidateRules()
    val groups = BenchSplits.probes.values.map(_.group).toSeq.distinct.sorted
    groups.foreach { g =>
      BenchSplits.builds(g)(spark, sf).foreach { case (art, df) =>
        df.write.mode("overwrite").parquet(s"$dir/$art")
      }
      spark.catalog.clearCache()
    }
    def art(name: String) = spark.read.parquet(s"$dir/$name")
    BenchSplits.probes.toSeq.sortBy(_._1).foreach { case (q, probe) =>
      val declared = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val probed = probe.run(spark, sf, art).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      assert(probed == declared, s"$q: probe-over-frozen diverged from declared")
      assert(probed.nonEmpty, s"$q: vacuous comparison")
    }
  }
}
