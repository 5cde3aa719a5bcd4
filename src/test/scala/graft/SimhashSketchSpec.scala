package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.SimhashSketch
import graft.llm.TextHash

/** The native simhash_sketch expression must match BOTH prior forms —
  * the declarative fold (TextHash.simhash32, the semantics spec) and the
  * explode + 32 vote-sum aggregate table the dedup queries used to build —
  * value-for-value.
  */
class SimhashSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("simhash-sketch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.codegen.fallback", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native matches the fold on adversarial token arrays") {
    import spark.implicits._
    val inputs: Seq[Seq[String]] = Seq(
      Seq(), Seq(""), Seq("a"), Seq("a", "a", "b"),
      Seq("ü", "中文", "🎯"), (1 to 300).map(i => s"t${i % 7}"))
    val rows = inputs.toDF("toks")
      .select(
        SimhashSketch(col("toks")).as("native"),
        TextHash.simhash32(col("toks")).as("hof"))
      .filter(!(col("native") <=> col("hof")))
      .collect()
    assert(rows.isEmpty, s"native/fold diverge: ${rows.mkString(", ")}")
  }

  test("NULL array yields NULL; a NULL token votes -1 everywhere, as the fold does") {
    import spark.implicits._
    val nullArr = spark.sql("SELECT cast(NULL AS ARRAY<STRING>) AS toks")
      .select(SimhashSketch(col("toks")).as("native")).head()
    assert(nullArr.isNullAt(0))
    val withNull = Seq(1).toDF("i")
      .select(array(lit("a"), lit(null: String)).as("toks"))
      .select(
        SimhashSketch(col("toks")).as("native"),
        TextHash.simhash32(col("toks")).as("hof"))
      .head()
    assert(withNull.getLong(0) == withNull.getLong(1))
  }

  test("native equals the explode+aggregate table over the harness corpus") {
    // the aggregate formulation the dedup queries used before — kept here
    // as the second pinned spec (vote sums per bit, bit set iff positive)
    val tok = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), explode(TextHash.tokens(col("text"))).as("w"))
      .select(col("doc_id"), TextHash.md5Long(col("w")).as("h"))
    val votes = (0 until 32).map { i =>
      sum(when((col("h") / lit(1L << i)).cast("long") % 2 === 1, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val value = (0 until 32)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val agg = tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), value.as("agg_sh"))
    val native = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        SimhashSketch(TextHash.tokens(col("text"))).as("sh"))
    val diverged = native.join(agg, "doc_id")
      .filter(col("sh") =!= col("agg_sh")).count()
    assert(diverged == 0)
    // and the sketch table plans without exchanges now
    assert(!native.queryExecution.executedPlan.toString.contains("Exchange"),
      "row-local sketch must plan without exchanges")
  }

  test("simhash_sketch resolves from SQL") {
    GraftCatalog.registerFunctions(spark)
    val got = spark.sql(
      "SELECT simhash_sketch(array('a', 'b', 'c')) AS sh").head()
    assert(!got.isNullAt(0))
  }
}
