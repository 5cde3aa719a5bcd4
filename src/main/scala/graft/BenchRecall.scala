package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Recall-vs-knobs curves for the IVFPQ serving stack (r12 ask #5): the
  * recall specs pin single operating points (ivfpq ≥ 0.6 probed-exact,
  * pq_rerank ≥ 0.8); a serving-shaped index needs the KNOB measured.
  * Sweeps probes × shortlist over a frozen index and reports, per
  * setting:
  *
  *  - recall@k vs the exact brute-force top-k (k = PqTopK) — the serving
  *    number;
  *  - coverage@k = fraction of the exact top-k that lives in a probed
  *    cluster — the IVF routing term alone, MONOTONE in probes by
  *    construction (probed cluster sets are nested), so the curve
  *    separates routing loss from shortlist/quantization loss.
  *
  * The index is built ONCE per directory (the build/probe split's
  * at-rest economics) and every setting probes the same artifacts.
  *
  * Usage: runMain graft.BenchRecall <dir> [<dir> ...]
  * Env:   SPARK_GRAFT_CPUS, SPARK_GRAFT_RECALL_PROBES (csv, default
  *        "1,2,4,8"), SPARK_GRAFT_RECALL_SHORTLIST (csv multipliers of
  *        PqTopK, default "10,20")
  * Prints ONE JSON line.
  */
object BenchRecall {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchRecall <dir> [<dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val probeSettings = sys.env.getOrElse("SPARK_GRAFT_RECALL_PROBES", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    val shortMults = sys.env.getOrElse("SPARK_GRAFT_RECALL_SHORTLIST", "10,20")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = Similarity.PqTopK
    val perDir = args.toSeq.map { dir =>
      // exact ground truth: brute-force top-k per query (top-5 emitted,
      // cut to k), and each truth row's cluster membership for coverage
      val truth = Similarity.bruteForceTopK(spark, dir)
        .filter(col("rk") <= k)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val truthByQ = truth.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val (cents, books, index) = Similarity.ivfPqIndex(spark, dir)
      val idx = index.cache()
      idx.count() // freeze the artifact before the sweep
      val memberOf = idx.select(col("vec_id"), col("cid")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // per-query probed-cluster ranking replicates the routing argmax so
      // coverage can be computed for ANY probe count from one collect
      val queries = graft.Tables.table(spark, dir, "embeddings")
        .filter(col("vec_id") < Similarity.NQueries)
      val results = scala.collection.mutable.LinkedHashMap[String, String]()
      for (sm <- shortMults; p <- probeSettings) {
        val t0 = System.nanoTime()
        val got = Similarity.ivfPqProbe(spark, dir, cents, books, idx,
            probes = p, shortlistPer = sm * k)
          .select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val dt = (System.nanoTime() - t0) / 1e9
        val byQ = got.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        val recalls = truthByQ.toSeq.map { case (q, ts) =>
          byQ.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
        }
        val recall = recalls.sum / recalls.size
        // coverage: truth neighbors whose cluster is among the query's p
        // nearest centroids — the routing table is the probe plan's own
        // argmax, collected (NQueries × p rows)
        val routedByQ = Similarity.ivfRouting(spark, dir, cents, probes = p)
          .collect().map(r => (r.getLong(0), r.getInt(1)))
          .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        val covs = truthByQ.toSeq.map { case (q, ts) =>
          val probedCids = routedByQ.getOrElse(q, Set.empty[Int])
          ts.count(t => memberOf.get(t).exists(probedCids.contains))
            .toDouble / ts.size
        }
        val coverage = covs.sum / covs.size
        val name = s"p${p}_s${sm}k"
        results(name) = f"""{"probes":$p,"shortlist":${sm * k},""" +
          f""""recall_at_$k":$recall%.4f,"coverage_at_$k":$coverage%.4f,""" +
          f""""probe_sec":$dt%.3f}"""
        System.err.println(f"[recall] $dir $name recall=$recall%.3f " +
          f"coverage=$coverage%.3f probe=$dt%.2fs")
      }
      spark.catalog.clearCache()
      val body = results.map { case (kk, v) => s""""$kk":$v""" }.mkString(",")
      s""""$dir":{$body}"""
    }
    println(s"""{"metric":"ivfpq_recall_curve","k":$k,""" +
      s""""dirs":{${perDir.mkString(",")}}}""")
    spark.stop()
  }
}
