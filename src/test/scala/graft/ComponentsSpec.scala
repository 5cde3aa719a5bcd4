package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Dedup

/** Connected-components invariants (the DuckDB recursive-closure oracle
  * pins exact values; this pins the graph properties that make the labels a
  * valid clustering).
  */
class ComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("components-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("labels cover every document, never exceed the doc_id, and are consistent across every near-dup pair") {
    val labels = Dedup.nearDupComponents(spark, dir).cache()
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(labels.count() == nDocs, "every document must be labeled")
    assert(labels.filter(col("component") > col("doc_id")).count() == 0,
      "a component label is the minimum id in the cluster")
    // both endpoints of every edge must agree
    val pairs = Dedup.simhashPairs(spark, dir).select("a_id", "b_id")
    val disagree = pairs
      .join(labels.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("component", "ca"), "a_id")
      .join(labels.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("component", "cb"), "b_id")
      .filter(col("ca") =!= col("cb"))
      .count()
    assert(disagree == 0, "paired documents must share a component")
    // at least one real (multi-doc) cluster exists in the fixture
    val multi = labels.groupBy("component").count().filter(col("count") > 1).count()
    assert(multi > 0, "fixture should contain at least one near-dup cluster")
    spark.catalog.clearCache()
  }
}
